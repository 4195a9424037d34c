"""LoRA pytree transforms (dmtpu/models/lora.py) + LoRA fine-tuning CLI.

Beyond reference parity (the reference fine-tunes nothing).  Checks the
functional contract: zero-init B means apply_lora is exactly the identity;
gradients reach the adapters (B first) and never the base; the merged model
moves after a train step; and scripts/train_sd.py runs end-to-end in LoRA
mode with tiny adapter checkpoints.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.models.lora import (
    DEFAULT_TARGETS,
    apply_lora,
    init_lora,
    lora_param_count,
    lora_scale,
    merge_lora,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_unet():
    from dmtpu.models.stablediffusion import SDUNetModel

    model = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                        num_res_blocks=1, attention_resolutions=(2,),
                        channel_mult=(1, 2), num_heads=2,
                        use_spatial_transformer=True, transformer_depth=1,
                        context_dim=24, legacy=False)
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([3, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 24))
    params = model.init(jax.random.PRNGKey(1), x, t, ctx)
    # perturb every leaf: the output head (and proj_out) are zero-init, so an
    # unperturbed net outputs exactly 0 and every gradient vanishes
    leaves, treedef = jax.tree.flatten(params)
    leaves = [l + 0.02 * jax.random.normal(jax.random.PRNGKey(50 + i), l.shape, l.dtype)
              for i, l in enumerate(leaves)]
    params = jax.tree.unflatten(treedef, leaves)
    return model, params, (x, t, ctx)


def test_init_targets_and_identity(tiny_unet):
    model, params, (x, t, ctx) = tiny_unet
    lora = init_lora(params, jax.random.PRNGKey(2), rank=4)
    # 2 attention levels (down id=2 + up) + middle, 2 attn blocks x 4 projs
    assert len(lora) > 0 and len(lora) % len(DEFAULT_TARGETS) == 0
    for k, ab in lora.items():
        assert k.endswith(".kernel") and any(f".{t_}." in k for t_ in DEFAULT_TARGETS)
        assert ab["a"].shape[1] == 4 and ab["b"].shape[0] == 4
        assert not np.any(np.asarray(ab["b"]))  # B zero-init

    merged = apply_lora(params, lora, scale=lora_scale(4, alpha=8))
    want = model.apply(params, x, t, ctx)
    got = model.apply(merged, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert lora_param_count(lora) < sum(p.size for p in jax.tree.leaves(params)) / 10


def test_grads_reach_adapters_only_and_model_moves(tiny_unet):
    model, params, (x, t, ctx) = tiny_unet
    lora = init_lora(params, jax.random.PRNGKey(3), rank=2)

    def loss(lo):
        out = model.apply(apply_lora(params, lo, 1.0), x, t, ctx)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(lora)
    gb = max(float(jnp.abs(v["b"]).max()) for v in g.values())
    assert gb > 0  # B gets gradient immediately (A @ dL/dW)
    # one SGD step on the adapters changes the merged model's output
    lora2 = jax.tree.map(lambda p, gg: p - 1e-1 * gg, lora, g)
    out0 = model.apply(apply_lora(params, lora, 1.0), x, t, ctx)
    out1 = model.apply(apply_lora(params, lora2, 1.0), x, t, ctx)
    assert float(jnp.abs(out1 - out0).max()) > 0
    assert merge_lora is apply_lora  # export alias


def test_apply_lora_rejects_stale_keys(tiny_unet):
    _, params, _ = tiny_unet
    with pytest.raises(ValueError, match="not in params"):
        apply_lora(params, {"nope.kernel": {"a": jnp.zeros((1, 1)),
                                            "b": jnp.zeros((1, 1))}})


def test_train_sd_lora_end_to_end(tmp_path):
    """The CLI in LoRA mode: trains, checkpoints the small adapter tree,
    resumes, and samples — base UNet stays frozen."""
    import importlib.util
    import sys

    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sd_train_config

    clip_dir = make_tiny_clip_dir(tmp_path / "clip")
    cfg = tiny_sd_train_config(tmp_path / "conf.yaml", clip_dir,
                               lora={"rank": 4, "alpha": 8})
    exp = str(tmp_path / "exp")

    spec = importlib.util.spec_from_file_location(
        "train_sd_cli_lora", os.path.join(REPO, "scripts", "train_sd.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["train_sd.py", "-c", cfg, "-e", exp, "-ni"]
    try:
        mod.main()
    finally:
        sys.argv = old

    log = open(glob.glob(os.path.join(exp, "output-*.log"))[0]).read()
    assert "LoRA fine-tune: rank=4" in log
    assert "End of training" in log
    assert glob.glob(os.path.join(exp, "samples", "*.png"))
    # adapter checkpoints are tiny (the whole point)
    ckpt = os.path.join(exp, "ckpt", "step000002")
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(ckpt) for f in fs)
    assert size < 5e6, f"LoRA ckpt unexpectedly large: {size}"


def test_merge_lora_cli(tmp_path):
    """scripts/merge_lora.py: adapter checkpoint + base -> standalone .npz
    that StableDiffusion.load_weights serves (the LoRA train->merge->serve
    workflow end-to-end, tiny models)."""
    import importlib.util
    import sys

    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sd_train_config

    clip_dir = make_tiny_clip_dir(tmp_path / "clip")
    cfg = tiny_sd_train_config(tmp_path / "conf.yaml", clip_dir,
                               lora={"rank": 4, "alpha": 8})
    exp = str(tmp_path / "exp")

    def run(script, name, argv):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REPO, "scripts", script))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        old = sys.argv
        sys.argv = [script] + argv
        try:
            mod.main()
        finally:
            sys.argv = old

    run("train_sd.py", "train_sd_cli_merge", ["-c", cfg, "-e", exp, "-ni"])
    ckpt = os.path.join(exp, "ckpt", "step000002")
    out = str(tmp_path / "merged.npz")
    run("merge_lora.py", "merge_lora_cli", ["-c", cfg, "--lora", ckpt, "--out", out])
    assert os.path.isfile(out)

    from dmtpu.utils.config import instantiate_from_config, load_config

    conf = load_config(cfg)
    seed, img_size = conf.get("seed", 0), conf.data.params.img_size
    sd = instantiate_from_config(conf.model)
    merged = sd.load_weights(out)
    assert set(merged) == {"unet", "vae", "text_encoder"}
    base = instantiate_from_config(conf.model).init_params(
        jax.random.PRNGKey(seed), img_size)
    # the tiny demo UNet's zero-init output head kills every gradient, so
    # the trained adapters keep B == 0 and the merge must be EXACTLY the
    # identity — same-seed base reproduces the training run's random init
    for a, b in zip(jax.tree.leaves(merged["unet"]), jax.tree.leaves(base["unet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-trivial adapters: hand-build a checkpoint with B != 0 and check
    # the merged result equals apply_lora's W + (alpha/rank) A @ B
    from dmtpu.utils import checkpoint as ckpt_lib
    from dmtpu.utils.optim import adamw

    lora = init_lora(base["unet"], jax.random.PRNGKey(5), rank=4)
    lora = jax.tree.map(lambda v: v + 0.1, lora)
    from dmtpu.parallel import TrainState

    st = TrainState.create(lora, adamw(1e-4), ema_decay=None)
    ck2 = ckpt_lib.save_checkpoint(str(tmp_path / "ck2"), 1, st)
    out2 = str(tmp_path / "merged2.npz")
    run("merge_lora.py", "merge_lora_cli_2",
        ["-c", cfg, "--lora", ck2, "--out", out2])
    merged2 = instantiate_from_config(conf.model).load_weights(out2)
    want = apply_lora(base["unet"], lora, lora_scale(4, 8))
    for a, b in zip(jax.tree.leaves(merged2["unet"]), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the merged model runs
    lat = img_size // 8
    outp = sd.unet.apply(merged2["unet"], jnp.zeros((1, lat, lat, 4)),
                         jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 32)))
    assert jnp.all(jnp.isfinite(outp))
