"""MMDiT (SD3-class, beyond parity): numpy block oracle + seam tests.

No reference counterpart, so — as with flow/PFDiff — the oracle is a
from-scratch numpy implementation of the MMDiT block math (per-stream
adaLN-Zero modulation, per-stream qkv with per-head QK RMSNorm, ONE joint
attention over [context | image], per-stream gated residual + MLP), fed the
live flax params with the zero-inits randomized so every path is exercised.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions import FlowMatching, FlowMatchingCFG
from dmtpu.models.mmdit import MMDIT_CONFIGS, MMDiT, MMDiTBlock, mmdit_model

RS = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# numpy oracle pieces (flax Dense kernels are [in, out] — no transpose)
# ---------------------------------------------------------------------------
def np_dense(x, p):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def np_ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps)


def np_rms(x, scale, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * scale


def np_silu(x):
    return x / (1 + np.exp(-x))


def np_gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def np_modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def np_mlp(x, p):
    return np_dense(np_gelu_tanh(np_dense(x, p["fc1"])), p["fc2"])


def np_qkv(tokens, shift, scale, p, heads):
    b, t, d = tokens.shape
    hd = d // heads
    qkv = np_dense(np_modulate(np_ln(tokens), shift, scale), p)
    qkv = qkv.reshape(b, t, 3, heads, hd)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def np_mmdit_block(params, ctx, x, c, heads, pre_only):
    d = x.shape[-1]
    lc = ctx.shape[1]
    silu_c = np_silu(c)
    xm = np.split(np_dense(silu_c, params["x_adaLN"]), 6, -1)
    cm = np.split(np_dense(silu_c, params["ctx_adaLN"]), 2 if pre_only else 6, -1)

    cq, ck, cv = np_qkv(ctx, cm[0], cm[1], params["ctx_qkv"], heads)
    xq, xk, xv = np_qkv(x, xm[0], xm[1], params["x_qkv"], heads)
    cq = np_rms(cq, np.asarray(params["ctx_qknorm"]["q_norm"]["scale"]))
    ck = np_rms(ck, np.asarray(params["ctx_qknorm"]["k_norm"]["scale"]))
    xq = np_rms(xq, np.asarray(params["x_qknorm"]["q_norm"]["scale"]))
    xk = np_rms(xk, np.asarray(params["x_qknorm"]["k_norm"]["scale"]))

    # one joint attention over [context | image], [B, T, H, hd] layout
    q = np.concatenate([cq, xq], axis=1).transpose(0, 2, 1, 3)
    k = np.concatenate([ck, xk], axis=1).transpose(0, 2, 1, 3)
    v = np.concatenate([cv, xv], axis=1).transpose(0, 2, 1, 3)
    logits = (q @ k.transpose(0, 1, 3, 2)) * (q.shape[-1] ** -0.5)
    logits -= logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(-1, keepdims=True)
    o = (w @ v).transpose(0, 2, 1, 3)
    o = o.reshape(o.shape[0], o.shape[1], d)
    c_att, x_att = o[:, :lc], o[:, lc:]

    x = x + xm[2][:, None] * np_dense(x_att, params["x_proj"])
    x = x + xm[5][:, None] * np_mlp(np_modulate(np_ln(x), xm[3], xm[4]),
                                    params["x_mlp"])
    if pre_only:
        return None, x
    ctx = ctx + cm[2][:, None] * np_dense(c_att, params["ctx_proj"])
    ctx = ctx + cm[5][:, None] * np_mlp(np_modulate(np_ln(ctx), cm[3], cm[4]),
                                        params["ctx_mlp"])
    return ctx, x


def _randomized(params, rs):
    """Replace every param (incl. the zero-inits) with random values so the
    oracle exercises all paths."""
    flat = jax.tree_util.tree_map(
        lambda a: jnp.asarray(0.1 * rs.randn(*a.shape), a.dtype), params)
    return flat


@pytest.mark.parametrize("pre_only", [False, True])
def test_block_numpy_oracle(pre_only):
    b, lc, lx, d, heads = 2, 3, 8, 32, 2
    blk = MMDiTBlock(num_heads=heads, context_pre_only=pre_only)
    ctx = jnp.asarray(RS.randn(b, lc, d), jnp.float32)
    x = jnp.asarray(RS.randn(b, lx, d), jnp.float32)
    c = jnp.asarray(RS.randn(b, d), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), ctx, x, c)
    variables = {"params": _randomized(variables["params"], RS)}
    got_ctx, got_x = blk.apply(variables, ctx, x, c)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    want_ctx, want_x = np_mmdit_block(
        p, np.asarray(ctx), np.asarray(x), np.asarray(c), heads, pre_only)
    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=2e-4, atol=2e-4)
    if pre_only:
        assert got_ctx is None
    else:
        np.testing.assert_allclose(np.asarray(got_ctx), want_ctx,
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# full-model structure / seams
# ---------------------------------------------------------------------------
def tiny_mmdit(**kw):
    return MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
                 depth=2, num_heads=2, context_dim=16, pooled_dim=12, **kw)


def tiny_inputs(b=2, train_dtype=jnp.float32):
    x = jnp.asarray(RS.randn(b, 8, 8, 3), train_dtype)
    t = jnp.linspace(10.0, 500.0, b)
    y = {"context": jnp.asarray(RS.randn(b, 5, 16), train_dtype),
         "pooled": jnp.asarray(RS.randn(b, 12), train_dtype)}
    return x, t, y


def test_identity_at_init():
    """adaLN-Zero + zero-init final layer: the init model is exactly 0."""
    m = tiny_mmdit()
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    out = m.apply(params, x, t, y)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_y_none_raises_and_null_conditioning():
    m = tiny_mmdit()
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    with pytest.raises(ValueError, match="null_conditioning"):
        m.apply(params, x, t, None)
    null = m.null_conditioning(2, 5)
    assert m.apply(params, x, t, null).shape == x.shape


def test_dropout_prob_one_equals_null():
    """cond_dropout_prob=1 must reproduce the null-conditioning forward
    exactly — train/sample nulls are the same all-zeros pytree."""
    m = tiny_mmdit(cond_dropout_prob=1.0)
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    params = {"params": _randomized(params["params"], np.random.RandomState(1))}
    dropped = m.apply(params, x, t, y, train=True,
                      force_drop_rng=jax.random.PRNGKey(7))
    null = m.null_conditioning(2, 5)
    want = m.apply(params, x, t, null)
    np.testing.assert_allclose(np.asarray(dropped), np.asarray(want), atol=1e-6)


def test_conditioning_width_mismatch_raises():
    """Config-vs-data width mismatches fail loudly at the seam (review fix),
    not deep inside a Dense kernel-shape error."""
    m = tiny_mmdit()
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    bad = dict(y, context=jnp.zeros((2, 5, 99)))
    with pytest.raises(ValueError, match="context_dim"):
        m.apply(params, x, t, bad)


def test_train_dotlist_shared_helper():
    """One dotlist parser for all trainers (review fix): k=v, --k=v and
    'k v' pair forms."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(repo, "scripts") not in sys.path:
        sys.path.insert(0, os.path.join(repo, "scripts"))
    from _common import train_dotlist

    assert train_dotlist(["a.b=1", "--c.d=2"]) == ["a.b=1", "c.d=2"]
    assert train_dotlist(["train.n_steps", "40"]) == ["train.n_steps=40"]
    assert train_dotlist([]) == []
    # mixed forms pair independently instead of zipping into bogus overrides
    # (advisor round-4 finding: ['a=b','lr','0.1'] used to mis-pair)
    assert train_dotlist(["a=b", "lr", "0.1"]) == ["a=b", "lr=0.1"]
    assert train_dotlist(["lr", "0.1", "--a=b"]) == ["lr=0.1", "a=b"]
    # a '='-containing token right after an unpaired key is that key's
    # VALUE (historical pair form: values may contain '=')
    assert train_dotlist(["train.tag", "run=5"]) == ["train.tag=run=5"]
    import pytest
    with pytest.raises(SystemExit):  # dangling key with no value
        train_dotlist(["a=b", "lr"])
    with pytest.raises(SystemExit):  # ...including after a value pairing
        train_dotlist(["lr", "a=b", "0.1"])


def test_pre_only_last_block_param_shapes():
    m = tiny_mmdit()
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)["params"]
    last = params["blocks__1"]
    first = params["blocks__0"]
    assert "ctx_proj" in first and "ctx_mlp" in first
    assert "ctx_proj" not in last and "ctx_mlp" not in last
    assert first["ctx_adaLN"]["kernel"].shape == (32, 6 * 32)
    assert last["ctx_adaLN"]["kernel"].shape == (32, 2 * 32)


def test_remat_bitwise():
    m = tiny_mmdit()
    mr = tiny_mmdit(use_checkpoint=True)
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    params = {"params": _randomized(params["params"], np.random.RandomState(2))}
    a = jax.jit(lambda p: m.apply(p, x, t, y))(params)
    b = jax.jit(lambda p: mr.apply(p, x, t, y))(params)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flow_cfg_seam():
    """FlowMatchingCFG guides the y pytree via the stock 2B merge: s=1
    equals the plain conditional sample; each step is ONE 2B call."""
    m = tiny_mmdit()
    x, t, y = tiny_inputs()
    variables = m.init(jax.random.PRNGKey(0), x, t, y)
    variables = {"params": _randomized(variables["params"],
                                       np.random.RandomState(3))}
    calls = []

    def model_fn(xx, tt, y=None, **kw):
        calls.append(xx.shape[0])
        return m.apply(variables, xx, tt, y)

    null = m.null_conditioning(2, 5)
    noise = jnp.asarray(RS.randn(2, 8, 8, 3), jnp.float32)
    cfg = FlowMatchingCFG(guidance_scale=1.0, respace_steps=4)
    got = cfg.sample(model_fn, noise, None, uncond_conditioning=null,
                     model_kwargs={"y": y})
    assert calls and all(n == 4 for n in calls)
    plain = FlowMatching(respace_steps=4).sample(
        lambda xx, tt, **kw: m.apply(variables, xx, tt, y), noise, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_flow_train_seam_overfit():
    """MMDiT drops into make_diffusion_loss_fn via the dict-batch branch
    (batch = {'image': x0, 'y': pytree}) and the loss decreases."""
    import optax

    from dmtpu.parallel.train import make_diffusion_loss_fn

    m = tiny_mmdit(cond_dropout_prob=0.0)
    x0 = jnp.asarray(np.random.RandomState(5).rand(4, 8, 8, 3), jnp.float32)
    _, t0, y = tiny_inputs(b=4)
    params = m.init(jax.random.PRNGKey(0), x0, t0, y)
    fm = FlowMatching(total_steps=1000)
    loss_fn = make_diffusion_loss_fn(fm, m.apply, total_steps=1000)
    batch = {"image": x0, "y": y}
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, batch, rng)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(40):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]


def test_train_mmdit_cli(tmp_path, monkeypatch):
    """scripts/train_mmdit.py end-to-end: precomputed-embedding dict batches
    through the compiled mesh step, EMA, checkpoint, CFG eval sampling."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(repo, "scripts") not in sys.path:
        sys.path.insert(0, os.path.join(repo, "scripts"))
    conf = f"""
seed: 0
data:
  target: dmtpu.data.captioned.SyntheticEmbedded
  params: {{img_size: 8, channels: 3, n: 32, context_len: 4, context_dim: 8,
            pooled_dim: 8, n_classes: 2}}
  img_channels: 3
dataloader: {{num_workers: 0}}
model:
  target: models.mmdit.MMDiT
  params: {{input_size: 8, patch_size: 2, in_channels: 3, hidden_size: 32,
            depth: 2, num_heads: 2, context_dim: 8, pooled_dim: 8}}
diffusion:
  target: diffusions.flow.FlowMatching
  params: {{total_steps: 1000, respace_steps: 4}}
train:
  n_steps: 6
  batch_size: 8
  micro_batch: 4
  clip_grad_norm: 1.0
  ema_decay: 0.99
  print_freq: 2
  save_freq: 5
  sample_freq: 5
  n_samples: 2
  optim: {{target: torch.optim.Adam, params: {{lr: 0.001}}}}
"""
    cfg = tmp_path / "conf.yaml"
    cfg.write_text(conf)
    exp = tmp_path / "exp"
    import train_mmdit

    monkeypatch.setattr(sys, "argv",
                        ["train_mmdit.py", "-c", str(cfg), "-e", str(exp), "-ni"])
    train_mmdit.main()
    # check_freq fires at (step+1) % freq == 0 -> step 4; the post-loop
    # final save adds step 5
    assert (exp / "samples" / "step000004.png").is_file()
    assert (exp / "ckpt" / "step000004").is_dir()
    assert (exp / "ckpt" / "step000005").is_dir()


def test_configs_and_registry():
    for name, cfg in MMDIT_CONFIGS.items():
        assert cfg["hidden_size"] == 64 * cfg["depth"]  # SD3 scaling rule
        assert cfg["hidden_size"] % cfg["num_heads"] == 0
    m = mmdit_model("MMDiT-S/2", input_size=8, in_channels=3,
                    context_dim=16, pooled_dim=12)
    assert m.depth == 6 and m.hidden_size == 384

    from dmtpu.utils.config import instantiate_from_config

    conf = {"target": "models.mmdit.MMDiT",
            "params": {"input_size": 8, "patch_size": 2, "in_channels": 3,
                       "hidden_size": 32, "depth": 2, "num_heads": 2,
                       "context_dim": 16, "pooled_dim": 12}}
    m2 = instantiate_from_config(conf)
    assert isinstance(m2, MMDiT)


def test_bf16_param_dtype_torso():
    """param_dtype=bf16 stores the torso (blocks/embedders/final) in bf16 —
    the L/2-on-16GB memory lever — while the conditioning MLPs and norm
    scales stay f32; forward still runs and matches the f32-param model's
    output shape/finiteness."""
    m = tiny_mmdit(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x, t, y = tiny_inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    sizes = {"bfloat16": 0, "float32": 0}
    for p in jax.tree.leaves(params):
        sizes[str(p.dtype)] += int(p.size)
    total = sizes["bfloat16"] + sizes["float32"]
    assert sizes["bfloat16"] / total > 0.5  # torso dominates even tiny configs
    # f32 islands survive: time/pooled MLPs + qk-norm scales
    flat = {"/".join(str(p) for p in k): v for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    f32_names = [k for k, v in flat.items() if v.dtype == jnp.float32]
    assert any("t_mlp0" in k for k in f32_names)
    assert any("qknorm" in k for k in f32_names)
    out = m.apply(params, x, t, y)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
