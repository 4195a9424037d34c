"""DP sampling through the CLI code path.

Runs ``scripts/sample_uncond.py`` main() on the 8-device CPU mesh (conftest
pins the CPU default device, so ``dp_sharding`` builds the CPU mesh) and
checks the sharded run's outputs are identical to the same sampling done
single-device with the library API — the reference's amortize+gather DP
semantics (reference: scripts/sample_uncond.py:183-190).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

CPU = jax.devices("cpu")[0]

CONF = """
data:
  target: datasets.synthetic.Synthetic
  params: {img_size: 16, channels: 3, n: 64}
  img_channels: 3
model:
  target: models.unet.UNet
  params: {in_channels: 3, out_channels: 3, dim: 32, dim_mults: [1, 2],
           use_attn: [false, false], num_res_blocks: 1}
diffusion:
  target: diffusions.ddpm.DDPM
  params: {total_steps: 50, beta_schedule: linear, objective: pred_eps,
           var_type: fixed_small, respace_type: uniform, respace_steps: 5}
"""


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from dmtpu.utils.config import instantiate_from_config, load_config

    d = tmp_path_factory.mktemp("dp_cli")
    cfg = d / "conf.yaml"
    cfg.write_text(CONF)
    conf = load_config(str(cfg))
    model = instantiate_from_config(conf.model)
    with jax.default_device(CPU):
        params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                            jnp.zeros((1,), jnp.int32))
    wpath = d / "w.npz"
    np.savez(wpath, params=np.asarray(
        jax.tree.map(lambda a: np.asarray(a), params), dtype=object))
    return str(cfg), str(wpath), model, params, conf


def test_sample_uncond_dp_matches_single_device(tiny_setup, tmp_path, monkeypatch):
    cfg, wpath, model, params, conf = tiny_setup
    assert len(jax.devices("cpu")) >= 8

    save_dir = str(tmp_path / "out")
    # n_samples=10, batch 6 → folds of 6 and 4; 6 and 4 both need padding to 8
    argv = ["sample_uncond.py", "-c", cfg, "--weights", wpath,
            "--n_samples", "10", "--save_dir", save_dir,
            "--batch_size", "6", "--sampler", "ddpm", "--seed", "11"]
    monkeypatch.setattr(sys, "argv", argv)
    import sample_uncond

    sample_uncond.main()
    files = sorted(os.listdir(save_dir))
    assert len(files) == 10

    # reproduce single-device with the library API (identical fold logic)
    from PIL import Image

    from dmtpu.diffusions import DDPM
    from dmtpu.utils.misc import amortize, image_norm_to_uint8

    diffuser = DDPM(total_steps=50, beta_schedule="linear", objective="pred_eps",
                    var_type="fixed_small", respace_type="uniform", respace_steps=5)
    rng = jax.random.PRNGKey(11)
    with jax.default_device(CPU):
        outs = []
        for i, bs in enumerate(amortize(10, 6)):
            # mirrors the CLI: independent keys for noise and reverse process
            k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
            noise = jax.random.normal(k_noise, (bs, 16, 16, 3))
            out = diffuser.sample(lambda x, t, **kw: model.apply(params, x, t), noise, k_samp)
            outs.append(np.clip(np.asarray(out), -1, 1))
        expected = np.concatenate(outs)

    for idx in range(10):
        got = np.asarray(Image.open(os.path.join(save_dir, f"{idx}.png")))
        want = image_norm_to_uint8(expected[idx])
        np.testing.assert_array_equal(got, want)


def test_dp_sharding_accepts_string_default_device():
    """jax_default_device may hold a platform STRING (JAX_DEFAULT_DEVICE=cpu
    stores the raw string); dp_sharding must not assume a Device object."""
    import _common

    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", "cpu")
    try:
        mesh, shard, replicate = _common.dp_sharding()
        assert mesh.devices.size == len(jax.devices("cpu"))
    finally:
        jax.config.update("jax_default_device", prev)


def test_sample_cfg_latent_npz_branch(tmp_path, monkeypatch):
    """sample_cfg's DiT/MDT latent branch: loads a convert_checkpoint-style
    .npz params tree, reads weights through the jitted argument, samples
    latents DP-sharded (dpmpp sampler), and skips VAE decode when absent."""
    from dmtpu.models.latent import LatentDiffusionWrapper

    conf = tmp_path / "latent.yaml"
    conf.write_text("""
data:
  params: {img_size: 32}
  img_channels: 3
  num_classes: 5
model:
  target: models.dit.dit.DiT
  params:
    vit_config:
      target: models.dit.model.DiT
      params: {input_size: 4, patch_size: 2, in_channels: 4, hidden_size: 32,
               depth: 2, num_heads: 4, num_classes: 5, learn_sigma: false}
diffusion:
  target: diffusions.ddpm.DDPM
  params: {total_steps: 50, respace_type: uniform, respace_steps: 4}
""")
    from dmtpu.utils.config import instantiate_from_config, load_config

    model = instantiate_from_config(load_config(str(conf)).model)
    assert isinstance(model, LatentDiffusionWrapper)
    with jax.default_device(CPU):
        vit_params = model.vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)),
                                    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    wpath = tmp_path / "latent.npz"
    np.savez(wpath, params=np.asarray(
        jax.tree.map(lambda a: np.asarray(a), {"vit": vit_params, "vae": None}),
        dtype=object))

    save_dir = str(tmp_path / "out")
    argv = ["sample_cfg.py", "-c", str(conf), "--weights", str(wpath),
            "--save_dir", save_dir, "--batch_size", "4",
            "--n_samples_each_class", "2", "--class_ids", "1",
            "--guidance_scale", "2.0", "--sampler", "dpmpp"]
    monkeypatch.setattr(sys, "argv", argv)
    import sample_cfg

    sample_cfg.main()
    files = sorted(os.listdir(os.path.join(save_dir, "class1")))
    assert files == ["0.png", "1.png"]

    # limited-interval CFG through the CLI (ddim; lax.cond branch per step)
    save_dir2 = str(tmp_path / "out_gi")
    argv = ["sample_cfg.py", "-c", str(conf), "--weights", str(wpath),
            "--save_dir", save_dir2, "--batch_size", "4",
            "--n_samples_each_class", "2", "--class_ids", "1",
            "--guidance_scale", "4.0", "--sampler", "ddim",
            "--guidance_interval", "10", "40"]
    monkeypatch.setattr(sys, "argv", argv)
    sample_cfg.main()
    files = sorted(os.listdir(os.path.join(save_dir2, "class1")))
    assert files == ["0.png", "1.png"]
