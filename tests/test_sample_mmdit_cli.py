"""scripts/sample_mmdit.py end-to-end: the MMDiT family's serving surface.

Covers every conditioning source (trained-checkpoint --class_idx, cached
--embeddings npz, demo --prompt pseudo-embeddings), the SD3 torch-checkpoint
convert path through scripts/convert_checkpoint.py, the demo-mode gate, and
the vae decode hook — all in-process on tiny configs.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "scripts") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY_CONF = """
seed: 0
data:
  target: dmtpu.data.captioned.SyntheticEmbedded
  params: {img_size: 8, channels: 3, n: 32, context_len: 4, context_dim: 8,
           pooled_dim: 8, n_classes: 2}
  img_channels: 3
dataloader: {num_workers: 0}
model:
  target: models.mmdit.MMDiT
  params: {input_size: 8, patch_size: 2, in_channels: 3, hidden_size: 32,
           depth: 2, num_heads: 2, context_dim: 8, pooled_dim: 8}
diffusion:
  target: diffusions.flow.FlowMatching
  params: {total_steps: 1000, respace_steps: 3}
train:
  n_steps: 4
  batch_size: 8
  micro_batch: 0
  clip_grad_norm: 1.0
  ema_decay: 0.99
  print_freq: 2
  save_freq: 4
  sample_freq: 100
  n_samples: 2
  optim: {target: torch.optim.Adam, params: {lr: 0.001}}
"""


def _write_conf(tmp_path, name="conf.yaml", extra=""):
    cfg = tmp_path / name
    cfg.write_text(TINY_CONF + extra)
    return str(cfg)


def _run_sample(monkeypatch, argv):
    import sample_mmdit

    monkeypatch.setattr(sys, "argv", ["sample_mmdit.py"] + argv)
    sample_mmdit.main()


def test_trained_checkpoint_class_idx_roundtrip(tmp_path, monkeypatch):
    """train_mmdit checkpoint -> sample_mmdit --class_idx: the family's full
    train-then-serve loop (EMA params through the orbax dir)."""
    import train_mmdit

    cfg = _write_conf(tmp_path)
    exp = tmp_path / "exp"
    monkeypatch.setattr(sys, "argv",
                        ["train_mmdit.py", "-c", cfg, "-e", str(exp), "-ni"])
    train_mmdit.main()
    ckpt = str(exp / "ckpt" / "step000003")
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--weights", ckpt, "--class_idx", "1",
                              "--save_dir", str(out), "--n_samples", "3",
                              "--batch_size", "2", "--guidance_scale", "2.0"])
    assert sorted(os.listdir(out)) == ["0.png", "1.png", "2.png"]
    # out-of-range class fails loudly
    with pytest.raises(SystemExit, match="out of range"):
        _run_sample(monkeypatch, ["-c", cfg, "--weights", ckpt,
                                  "--class_idx", "7", "--save_dir", str(out)])


def test_demo_prompt_and_gate(tmp_path, monkeypatch):
    cfg = _write_conf(tmp_path)
    out = tmp_path / "demo"
    _run_sample(monkeypatch, ["-c", cfg, "--prompt", "a tiny square",
                              "--save_dir", str(out), "--n_samples", "2",
                              "--batch_size", "2", "--guidance_scale", "1.0"])
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]
    # FlowDPM multistep through the CLI, CFG branch (FlowDPMSolverCFG)
    out2 = tmp_path / "demo_dpm"
    _run_sample(monkeypatch, ["-c", cfg, "--prompt", "a tiny square",
                              "--save_dir", str(out2), "--n_samples", "2",
                              "--batch_size", "2", "--solver", "dpm",
                              "--respace_steps", "4"])
    assert sorted(os.listdir(out2)) == ["0.png", "1.png"]
    # pseudo-embeddings with a real checkpoint are rejected (sample_sd rule)
    fake = tmp_path / "w.npz"
    from dmtpu.models.mmdit import MMDiT

    m = MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
              depth=2, num_heads=2, context_dim=8, pooled_dim=8)
    y = {"context": jnp.zeros((1, 4, 8)), "pooled": jnp.zeros((1, 8))}
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)), y)
    np.savez(fake, params=np.asarray(
        jax.tree.map(np.asarray, params), dtype=object))
    with pytest.raises(SystemExit, match="pseudo-embeddings"):
        _run_sample(monkeypatch, ["-c", cfg, "--weights", str(fake),
                                  "--prompt", "x", "--save_dir", str(out)])


def test_embeddings_npz_and_npz_weights(tmp_path, monkeypatch):
    """Cached-embedding serving: .npz weights + .npz embeddings (2 rows
    cycling over 3 samples)."""
    from dmtpu.models.mmdit import MMDiT

    cfg = _write_conf(tmp_path)
    m = MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
              depth=2, num_heads=2, context_dim=8, pooled_dim=8)
    y = {"context": jnp.zeros((1, 4, 8)), "pooled": jnp.zeros((1, 8))}
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)), y)
    w = tmp_path / "w.npz"
    np.savez(w, params=np.asarray(jax.tree.map(np.asarray, params), dtype=object))
    emb = tmp_path / "emb.npz"
    rs = np.random.RandomState(0)
    np.savez(emb, context=rs.randn(2, 4, 8), pooled=rs.randn(2, 8))
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--weights", str(w),
                              "--embeddings", str(emb), "--save_dir", str(out),
                              "--n_samples", "3", "--batch_size", "3",
                              "--solver", "heun", "--time_shift", "2.0"])
    assert len(os.listdir(out)) == 3


def test_embeddings_rank_combinations(tmp_path, monkeypatch):
    """context/pooled ranks are independent ([L,Dc]+[1,Dp] works); a row
    count mismatch aborts loudly instead of dying inside the pooled MLP
    (round-5 review finding)."""
    cfg = _write_conf(tmp_path)
    rs = np.random.RandomState(0)
    emb = tmp_path / "emb.npz"
    np.savez(emb, context=rs.randn(4, 8), pooled=rs.randn(1, 8))
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--embeddings", str(emb),
                              "--save_dir", str(out), "--n_samples", "2",
                              "--batch_size", "2"])
    assert len(os.listdir(out)) == 2
    bad = tmp_path / "bad.npz"
    np.savez(bad, context=rs.randn(2, 4, 8), pooled=rs.randn(8))
    with pytest.raises(SystemExit, match="row-count mismatch"):
        _run_sample(monkeypatch, ["-c", cfg, "--embeddings", str(bad),
                                  "--save_dir", str(tmp_path / "o2"),
                                  "--n_samples", "1", "--batch_size", "1"])


def test_flowdpm_target_selects_dpm_solver(tmp_path, monkeypatch):
    """A config whose diffusion.target IS FlowDPMSolverCFG (no solver param)
    must sample with FlowDPM, not silently degrade to first-order Euler
    (round-5 review finding); a config-params guidance_scale must not
    collide with the CLI's."""
    import sample_mmdit

    cfg = _write_conf(tmp_path, extra="")
    text = open(cfg).read().replace(
        "target: diffusions.flow.FlowMatching",
        "target: diffusions.flow_dpm.FlowDPMSolverCFG").replace(
        "params: {total_steps: 1000, respace_steps: 3}",
        "params: {total_steps: 1000, respace_steps: 3, guidance_scale: 3.0}")
    open(cfg, "w").write(text)
    built = {}
    real = sample_mmdit.FlowDPMSolverCFG

    class Spy(real):
        def __init__(self, *a, **k):
            built["guidance_scale"] = k.get("guidance_scale")
            super().__init__(*a, **k)

    monkeypatch.setattr(sample_mmdit, "FlowDPMSolverCFG", Spy)
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--prompt", "demo",
                              "--save_dir", str(out), "--n_samples", "1",
                              "--batch_size", "1", "--guidance_scale", "2.0"])
    assert built == {"guidance_scale": 2.0}  # dpm route + CLI scale wins
    assert len(os.listdir(out)) == 1


def test_sd3_torch_convert_then_sample(tmp_path, monkeypatch):
    """SD3-layout torch checkpoint -> convert_checkpoint.py -> npz ->
    sample_mmdit: the real-weights landing path, end to end."""
    import torch

    from dmtpu.models.mmdit import MMDiT
    from tests.test_convert_mmdit import _to_sgm

    cfg = _write_conf(tmp_path)
    m = MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
              depth=2, num_heads=2, context_dim=8, pooled_dim=8)
    y = {"context": jnp.zeros((1, 4, 8)), "pooled": jnp.zeros((1, 8))}
    params = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)), y)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.random.RandomState(3).randn(*a.shape), a.dtype),
        params)
    sd = {f"model.diffusion_model.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _to_sgm(params).items()
          if not k.startswith(("first_stage_model.", "text_encoders."))}
    ckpt = tmp_path / "sd3_tiny.pt"
    torch.save({"state_dict": sd}, ckpt)

    import convert_checkpoint

    out_npz = tmp_path / "sd3.npz"
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py", "-c", cfg,
                                      "--weights", str(ckpt),
                                      "--out", str(out_npz)])
    convert_checkpoint.main()
    assert out_npz.is_file()

    out = tmp_path / "out"
    emb = tmp_path / "emb.npz"
    rs = np.random.RandomState(1)
    np.savez(emb, context=rs.randn(4, 8), pooled=rs.randn(8))
    _run_sample(monkeypatch, ["-c", cfg, "--weights", str(out_npz),
                              "--embeddings", str(emb), "--save_dir", str(out),
                              "--n_samples", "2", "--batch_size", "2"])
    assert len(os.listdir(out)) == 2


def test_sd3_bundled_vae_extraction(tmp_path, monkeypatch):
    """The single-file SD3 release bundles the VAE under first_stage_model.*:
    convert_checkpoint must extract it to <out>_vae.npz (against the
    config's vae block) and sample_mmdit --vae_weights must decode with it."""
    import torch

    from tests.conftest import require_reference
    require_reference()
    from models.stablediffusion.autoencoder import AutoEncoderKL as RefVAE

    from dmtpu.models.mmdit import MMDiT
    from tests.test_convert_mmdit import _to_sgm

    vae_extra = """
vae:
  target: models.stablediffusion.autoencoder.AutoEncoderKL
  params: {ch: 32, ch_mult: [1, 2], num_res_blocks: 1, z_channels: 3,
           embed_dim: 3, resolution: 16, attn_resolutions: []}
  scale_factor: 1.0
  shift_factor: 0.0
"""
    cfg = _write_conf(tmp_path, extra=vae_extra)
    m = MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
              depth=2, num_heads=2, context_dim=8, pooled_dim=8)
    y = {"context": jnp.zeros((1, 4, 8)), "pooled": jnp.zeros((1, 8))}
    params = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)), y)
    sd = {f"model.diffusion_model.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _to_sgm(params).items()
          # drop _to_sgm's sentinel extras: this test bundles a REAL vae
          if not k.startswith(("first_stage_model.", "text_encoders."))}
    torch.manual_seed(0)
    ref_vae = RefVAE(embed_dim=3, z_channels=3, resolution=16, in_channels=3,
                     out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                     attn_resolutions=[])
    sd.update({f"first_stage_model.{k}": v
               for k, v in ref_vae.state_dict().items()})
    ckpt = tmp_path / "sd3_tiny.pt"
    torch.save({"state_dict": sd}, ckpt)

    import convert_checkpoint

    out_npz = tmp_path / "sd3.npz"
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py", "-c", cfg,
                                      "--weights", str(ckpt),
                                      "--out", str(out_npz)])
    convert_checkpoint.main()
    vae_npz = tmp_path / "sd3_vae.npz"
    assert out_npz.is_file() and vae_npz.is_file()

    out = tmp_path / "out"
    emb = tmp_path / "emb.npz"
    rs = np.random.RandomState(1)
    np.savez(emb, context=rs.randn(4, 8), pooled=rs.randn(8))
    _run_sample(monkeypatch, ["-c", cfg, "--weights", str(out_npz),
                              "--vae_weights", str(vae_npz),
                              "--embeddings", str(emb), "--save_dir", str(out),
                              "--n_samples", "1", "--batch_size", "1"])
    assert os.listdir(out) == ["0.png"]


def test_vae_decode_hook(tmp_path, monkeypatch):
    """A config with a vae section decodes sampled latents before saving."""
    vae_extra = """
vae:
  target: models.stablediffusion.autoencoder.AutoEncoderKL
  params: {ch: 32, ch_mult: [1], num_res_blocks: 1, z_channels: 3,
           embed_dim: 3, resolution: 8}
  scale_factor: 1.0
  shift_factor: 0.0
"""
    cfg = _write_conf(tmp_path, extra=vae_extra)
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--prompt", "latents",
                              "--save_dir", str(out), "--n_samples", "1",
                              "--batch_size", "1"])
    assert os.listdir(out) == ["0.png"]


def test_sd3_medium_config_instantiates():
    """configs/sd3_medium.yaml resolves every target and matches the public
    release's parameter count (~2.03B) at eval_shape (no allocation)."""
    from dmtpu.utils.config import instantiate_from_config, load_config

    conf = load_config(os.path.join(REPO, "configs", "sd3_medium.yaml"))
    m = instantiate_from_config(conf.model)
    assert m.qk_norm is False and m.pos_embed_max_size == 192
    y = {"context": jnp.zeros((1, 154, 4096)), "pooled": jnp.zeros((1, 2048))}
    init = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 128, 16)), jnp.zeros((1,)), y)
    n = sum(int(p.size) for p in jax.tree.leaves(init))
    assert 1.9e9 < n < 2.2e9
    d = instantiate_from_config(conf.diffusion)
    assert float(d.time_shift) == 3.0
    vae = instantiate_from_config(conf.vae)
    assert vae.z_channels == 16
