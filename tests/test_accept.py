"""scripts/accept.py — the BASELINE.md acceptance runner.

Artifacts (pt_inception weights, CIFAR-10, trained checkpoints) are absent in
this zero-egress image, so the tests fabricate synthetic stand-ins: the point
is that the full pipeline (row selection -> sampling -> Inception features ->
FID/IS -> tolerance diff -> JSON/exit code) executes end-to-end, and that the
missing-artifact path names exactly what is absent.
"""
import json
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

CPU = jax.devices("cpu")[0]


def test_accept_self_test_and_tolerances():
    import accept

    assert accept.self_test() == 0
    # the registered tables cover every BASELINE.md row: 14 DDPM + 15
    # sampler + 8 DDPM-IP + 4 CFG
    assert len(accept.ROWS) == 41
    groups = {v["group"] for v in accept.ROWS.values()}
    assert groups == set(accept.GROUP_CONFIG)


def test_accept_missing_artifacts_path(monkeypatch, capsys):
    import accept

    monkeypatch.setattr(sys, "argv", ["accept.py", "--group", "ddpm"])
    monkeypatch.delenv("DMTPU_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("DMTPU_DATA_DIR", raising=False)
    monkeypatch.delenv("DMTPU_ACCEPT_WEIGHTS", raising=False)
    with pytest.raises(SystemExit) as e:
        accept.main()
    assert e.value.code == 2
    out = capsys.readouterr().out
    assert "inception weights" in out and "CIFAR-10" in out and "checkpoint" in out


def _fake_inception_pth(tmp_path):
    import torch

    from dmtpu.eval.inception import FIDInceptionV3
    from tests.test_inception import _torch_layout_state_dict

    with jax.default_device(CPU):
        variables = FIDInceptionV3().init(jax.random.PRNGKey(3),
                                          jnp.zeros((1, 299, 299, 3)))
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
    return str(wpath)


def _fake_cifar10(tmp_path, n_per_batch=4):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rs = np.random.RandomState(1)
    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rs.randint(0, 256, (n_per_batch, 3072),
                                             dtype=np.uint8).astype(np.uint8),
                         b"labels": list(rs.randint(0, 10, n_per_batch))}, f)
    return str(tmp_path)


@pytest.mark.slow
def test_accept_end_to_end_synthetic(tmp_path, monkeypatch, capsys):
    """Full run_rows drive on one row with fabricated artifacts: random
    weights cannot hit the published FID, so the expected outcome is a
    completed run with finite metrics, a FAIL verdict, and exit code 1."""
    import accept

    from dmtpu.utils.config import instantiate_from_config, load_config

    inception = _fake_inception_pth(tmp_path)
    cifar = _fake_cifar10(tmp_path)

    conf = load_config(os.path.join(REPO, "configs", "ddpm_synthetic.yaml"))
    with jax.default_device(CPU):
        model = instantiate_from_config(conf.model)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            jnp.zeros((1,), jnp.int32))
    ckpt = tmp_path / "ckpt.npz"
    np.savez(str(ckpt), params=np.array(
        jax.tree.map(np.asarray, params), dtype=object))

    out_json = tmp_path / "accept.json"
    argv = ["accept.py", "--rows", "ddim_10",
            "--config", os.path.join(REPO, "configs", "ddpm_synthetic.yaml"),
            "--weights", str(ckpt), "--inception_weights", inception,
            "--cifar10_dir", cifar, "--n_samples", "8", "--batch_size", "8",
            "--eval_batch_size", "8", "--is_splits", "2",
            "--out", str(out_json)]
    monkeypatch.setattr(sys, "argv", argv)
    with jax.default_device(CPU):
        with pytest.raises(SystemExit) as e:
            accept.main()
    assert e.value.code == 1  # ran to completion, out of tolerance
    res = json.loads(out_json.read_text())
    fid = res["rows"]["ddim_10"]["fid"]
    assert np.isfinite(fid) and fid > 0
    assert res["rows"]["ddim_10"]["is_mean"] >= 1.0
    assert res["failed"] == 1
    out = capsys.readouterr().out
    assert "FAIL" in out and "ddim_10" in out
