"""scripts/sample_sd.py — the headless SD serving CLI, demo mode.

Drives the full pipeline (pseudo-tokenize -> text encode -> sampler scan ->
VAE decode -> PNGs) on the tiny SD fixture, across the serving-accelerator
matrix (ToMe, FreeU, DeepCache, limited-interval CFG, PFDiff).
"""
import os
import sys

import pytest

from tests._tiny_fixtures import tiny_sd_config

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def _run(tmp_path, monkeypatch, out_name, extra_args):
    conf = tiny_sd_config(tmp_path / "sd.yaml")
    save = str(tmp_path / out_name)
    argv = ["sample_sd.py", "-c", conf, "--prompt", "a tiny cat",
            "--save_dir", save, "--n_samples", "2", "--batch_size", "2",
            "--height", "64", "--width", "64", "--respace_steps", "4",
            "--guidance_scale", "3.0"] + extra_args
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.delenv("DMTPU_CLIP_TOKENIZER", raising=False)
    import sample_sd

    sample_sd.main()
    return sorted(os.listdir(save))


@pytest.mark.parametrize("name,extra", [
    ("ddim", []),
    ("accel", ["--tome_ratio", "0.5", "--tome_max_downsample", "2", "--freeu"]),
    ("freeu21", ["--freeu", "sd21"]),
    ("freeu_scales", ["--freeu_scales", "1.2", "1.3", "0.9", "0.3"]),
    ("deepcache", ["--deepcache", "2", "2"]),
    ("interval", ["--guidance_interval", "20", "80"]),
    ("pfdiff", ["--sampler", "pfdiff"]),
    ("pfdiff_deepcache", ["--sampler", "pfdiff", "--deepcache", "2", "2"]),
    ("max_stack", ["--sampler", "pfdiff", "--deepcache", "2", "2",
                   "--tome_ratio", "0.5", "--tome_max_downsample", "2",
                   "--freeu"]),
])
def test_sample_sd_matrix(tmp_path, monkeypatch, name, extra):
    files = _run(tmp_path, monkeypatch, f"out_{name}", extra)
    assert files == ["0.png", "1.png"]


def test_img2img(tmp_path, monkeypatch):
    # SDEdit-in-latent-space: encode a real PNG, diffuse to strength*steps,
    # run the reverse tail; dpmpp also supports start_step
    from PIL import Image
    import numpy as np

    src = tmp_path / "init.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(src)
    for name, extra in [("i2i", []), ("i2i_dpmpp", ["--sampler", "dpmpp"])]:
        files = _run(tmp_path, monkeypatch, f"out_{name}",
                     ["--init_image", str(src), "--strength", "0.5"] + extra)
        assert files == ["0.png", "1.png"]


def test_inpaint(tmp_path, monkeypatch):
    # latent inpainting: image + mask through MaskGuidanceDDIMCFG
    from PIL import Image
    import numpy as np

    rng = np.random.RandomState(0)
    src = tmp_path / "inp.png"
    Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(src)
    mask = tmp_path / "mask.png"
    m = np.full((48, 48), 255, np.uint8)
    m[12:36, 12:36] = 0  # regenerate the center
    Image.fromarray(m).save(mask)
    files = _run(tmp_path, monkeypatch, "out_inpaint",
                 ["--inpaint_image", str(src), "--inpaint_mask", str(mask)])
    assert files == ["0.png", "1.png"]


def test_inpaint_flag_conflicts(tmp_path, monkeypatch):
    import sample_sd

    conf = tiny_sd_config(tmp_path / "sd.yaml")
    base = ["sample_sd.py", "-c", conf, "--prompt", "x",
            "--save_dir", str(tmp_path / "o")]
    for bad in (["--inpaint_image", "a.png"],  # mask missing
                ["--inpaint_image", "a.png", "--inpaint_mask", "m.png",
                 "--sampler", "dpmpp"],
                ["--inpaint_image", "a.png", "--inpaint_mask", "m.png",
                 "--init_image", "b.png"]):
        monkeypatch.setattr(sys, "argv", base + bad)
        with pytest.raises(SystemExit):
            sample_sd.main()


def test_img2img_flag_conflicts(tmp_path, monkeypatch):
    import sample_sd

    conf = tiny_sd_config(tmp_path / "sd.yaml")
    base = ["sample_sd.py", "-c", conf, "--prompt", "x",
            "--save_dir", str(tmp_path / "o"), "--init_image", "x.png"]
    for bad in (["--sampler", "pfdiff"], ["--deepcache", "2", "1"],
                ["--strength", "1.5"]):
        monkeypatch.setattr(sys, "argv", base + bad)
        with pytest.raises(SystemExit):
            sample_sd.main()


def test_real_weights_without_tokenizer_abort(tmp_path, monkeypatch):
    # pseudo-tokens + real weights would silently make garbage images
    # (review finding): the CLI must refuse instead
    import jax
    import numpy as np

    from dmtpu.utils.config import instantiate_from_config, load_config

    conf = tiny_sd_config(tmp_path / "sd.yaml")
    sd = instantiate_from_config(load_config(conf).model)
    params = sd.init_params(jax.random.PRNGKey(0), img_size=64)
    wpath = tmp_path / "w.npz"
    np.savez(wpath, params=np.asarray(
        jax.tree.map(lambda a: np.asarray(a), params), dtype=object))
    argv = ["sample_sd.py", "-c", conf, "--prompt", "a cat",
            "--save_dir", str(tmp_path / "o"), "--weights", str(wpath),
            "--n_samples", "2", "--batch_size", "2", "--height", "64",
            "--width", "64", "--respace_steps", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.delenv("DMTPU_CLIP_TOKENIZER", raising=False)
    import sample_sd

    with pytest.raises(SystemExit, match="DMTPU_CLIP_TOKENIZER"):
        sample_sd.main()


def test_flag_conflicts_abort(tmp_path, monkeypatch):
    conf = tiny_sd_config(tmp_path / "sd.yaml")
    argv = ["sample_sd.py", "-c", conf, "--prompt", "x",
            "--save_dir", str(tmp_path / "o"),
            "--deepcache", "2", "1", "--sampler", "dpmpp"]
    monkeypatch.setattr(sys, "argv", argv)
    import sample_sd

    with pytest.raises(SystemExit):
        sample_sd.main()
