"""scripts/evaluate.py end-to-end: classic FID + IS through the real
torch-checkpoint loading path, with fabricated (random-init) inception
weights and the reference's CIFAR-10 fixture images."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

CPU = jax.devices("cpu")[0]
FIXTURES = "/root/reference/test_images/cifar10"


@pytest.mark.skipif(not os.path.isdir(FIXTURES), reason="reference fixtures unavailable")
def test_evaluate_cli_classic_fid(tmp_path, monkeypatch, capsys):
    import torch

    from dmtpu.eval.inception import FIDInceptionV3
    from tests.test_inception import _torch_layout_state_dict

    with jax.default_device(CPU):
        model = FIDInceptionV3()
        variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 299, 299, 3)))
    # random init collapses activations through ~90 conv+BN layers; perturb
    # BN stats/biases so the fabricated network produces non-degenerate
    # features (we test the pipeline, not feature quality)
    rs = np.random.RandomState(0)
    sd = {}
    for k, v in _torch_layout_state_dict(variables).items():
        v = np.asarray(v, np.float32)
        if k.endswith("running_mean") or k.endswith("bn.bias"):
            v = v + rs.randn(*v.shape).astype(np.float32) * 0.5
        elif k.endswith("bn.weight"):
            v = v * (1.0 + 0.5 * np.abs(rs.randn(*v.shape).astype(np.float32)))
        sd[k] = torch.from_numpy(v)
    wpath = tmp_path / "pt_inception_random.pth"
    torch.save(sd, str(wpath))

    # two disjoint fixture subsets as "real" and "fake"
    files = sorted(os.listdir(FIXTURES))[:16]
    real_dir, fake_dir = tmp_path / "real", tmp_path / "fake"
    real_dir.mkdir(), fake_dir.mkdir()
    for f in files[:8]:
        os.symlink(os.path.join(FIXTURES, f), real_dir / f)
    for f in files[8:]:
        os.symlink(os.path.join(FIXTURES, f), fake_dir / f)

    argv = ["evaluate.py", "--real_dir", str(real_dir), "--fake_dir", str(fake_dir),
            "--img_size", "32", "--batch_size", "8",
            "--inception_weights", str(wpath), "--is_splits", "2",
            "--kid", "--kid_subsets", "4", "--kid_subset_size", "8"]
    monkeypatch.setattr(sys, "argv", argv)
    with jax.default_device(CPU):
        import evaluate

        evaluate.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["fid"]) and out["fid"] > 0
    assert out["is_mean"] >= 1.0
    assert np.isfinite(out["kid_mean"]) and np.isfinite(out["kid_std"])
