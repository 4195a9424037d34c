"""scripts/train_sd.py end-to-end on tiny models (CPU).

Beyond reference parity (the reference trains pixel-space DDPMs only):
latent text-to-image fine-tuning with frozen VAE + CLIP towers, caption
dropout, EMA, adafactor, checkpoint save + resume, and the CFG sampling
preview — the whole CLI main() is executed in-process.
"""
import glob
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_main(argv):
    # train_sd.py does `from _common import ...` at call time; a CLI run has
    # scripts/ as sys.path[0], a by-path import here does not (order-
    # independence: don't rely on an earlier test having inserted it)
    if os.path.join(REPO, "scripts") not in sys.path:
        sys.path.insert(0, os.path.join(REPO, "scripts"))
    spec = importlib.util.spec_from_file_location(
        "train_sd_cli", os.path.join(REPO, "scripts", "train_sd.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["train_sd.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sd_train_config

    d = tmp_path_factory.mktemp("train_sd")
    clip_dir = make_tiny_clip_dir(d / "clip")
    cfg = tiny_sd_train_config(d / "conf.yaml", clip_dir)
    return d, cfg


def test_train_sd_end_to_end_and_resume(setup):
    d, cfg = setup
    exp = str(d / "exp")

    _run_main(["-c", cfg, "-e", exp, "-ni"])
    ckpts = sorted(os.listdir(os.path.join(exp, "ckpt")))
    assert "step000002" in ckpts, ckpts
    # the CFG preview sampled and decoded an image grid
    assert glob.glob(os.path.join(exp, "samples", "*.png"))
    log = glob.glob(os.path.join(exp, "output-*.log"))[0]
    text = open(log).read()
    assert "End of training" in text
    assert "RANDOM-INIT" in text  # no weights: -> demo/testing init announced

    # resume from latest and run 2 more steps
    _run_main(["-c", cfg, "-e", exp, "-ni", "-r", "latest", "train.n_steps=5"])
    ckpts = sorted(os.listdir(os.path.join(exp, "ckpt")))
    assert "step000004" in ckpts, ckpts
    text = "\n".join(open(f).read() for f in
                     glob.glob(os.path.join(exp, "output-*.log")))
    assert "Resumed from" in text


def test_captioned_datasets(tmp_path):
    """CaptionedImageDir reads the diffusers/kohya sidecar layout; items are
    {'image', 'caption'} dicts the loader collates."""
    import numpy as np
    from PIL import Image

    from dmtpu.data import DataLoader
    from dmtpu.data.captioned import CaptionedImageDir, SyntheticCaptioned

    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(4):
        Image.fromarray(np.full((16, 16, 3), i * 40, np.uint8)).save(root / f"{i}.png")
        if i % 2 == 0:
            (root / f"{i}.txt").write_text(f"caption {i}")

    ds = CaptionedImageDir(str(root), img_size=8, default_caption="fallback",
                           flip_p=0.0)
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (8, 8, 3) and item["caption"] == "caption 0"
    assert ds[1]["caption"] == "fallback"

    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False,
                                 num_workers=0)))
    assert batch["image"].shape == (4, 8, 8, 3)
    assert list(batch["caption"])[0] == "caption 0"

    syn = SyntheticCaptioned(img_size=8, n=6)
    assert len(syn) == 6
    assert syn[5]["image"].shape == (8, 8, 3)
    assert isinstance(syn[1]["caption"], str)
