"""DiT / MDTv2: conversion + numerical parity vs an independent numpy oracle.

timm isn't installed, so the reference torch models can't be imported; the
oracle here is a from-scratch numpy implementation of the upstream math
(patchify, adaLN-zero blocks, timm attention/mlp, rel-pos-bias, final layer).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.convert.zoo import convert_dit, convert_mdt
from dmtpu.models.dit import DiT, get_2d_sincos_pos_embed
from dmtpu.models.mdt import MDTv2, _relative_position_index

RS = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# numpy oracle pieces
# ---------------------------------------------------------------------------
def np_linear(x, w, b):
    return x @ w.T + b


def np_ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def np_gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def np_silu(x):
    return x / (1 + np.exp(-x))


def np_modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def np_attention(x, sd, prefix, heads, rel_bias=None):
    b, t, d = x.shape
    hd = d // heads
    qkv = np_linear(x, sd[f"{prefix}.qkv.weight"], sd[f"{prefix}.qkv.bias"])
    qkv = qkv.reshape(b, t, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)
    if rel_bias is not None:
        logits = logits + rel_bias
    logits -= logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(-1, keepdims=True)
    out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return np_linear(out, sd[f"{prefix}.proj.weight"], sd[f"{prefix}.proj.bias"])


def np_mlp(x, sd, prefix):
    h = np_gelu_tanh(np_linear(x, sd[f"{prefix}.fc1.weight"], sd[f"{prefix}.fc1.bias"]))
    return np_linear(h, sd[f"{prefix}.fc2.weight"], sd[f"{prefix}.fc2.bias"])


def np_block(x, c, sd, prefix, heads, rel_bias=None, skip=None):
    if f"{prefix}.skip_linear.weight" in sd and skip is not None:
        x = np_linear(np.concatenate([x, skip], -1),
                      sd[f"{prefix}.skip_linear.weight"], sd[f"{prefix}.skip_linear.bias"])
    mod = np_linear(np_silu(c), sd[f"{prefix}.adaLN_modulation.1.weight"],
                    sd[f"{prefix}.adaLN_modulation.1.bias"])
    s1, sc1, g1, s2, sc2, g2 = np.split(mod, 6, axis=-1)
    x = x + g1[:, None] * np_attention(np_modulate(np_ln(x), s1, sc1), sd, f"{prefix}.attn",
                                       heads, rel_bias)
    x = x + g2[:, None] * np_mlp(np_modulate(np_ln(x), s2, sc2), sd, f"{prefix}.mlp")
    return x


def np_patchify(x_nchw, sd, hidden, p):
    b, cin, h, w = x_nchw.shape
    g = h // p
    w_conv = sd["x_embedder.proj.weight"]  # [D, C, p, p]
    patches = x_nchw.reshape(b, cin, g, p, g, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    return patches @ w_conv.reshape(hidden, -1).T + sd["x_embedder.proj.bias"]


def np_t_embed(t, sd, hidden):
    half = 128
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = t[:, None].astype(np.float64) * freqs[None]
    emb = np.concatenate([np.cos(args), np.sin(args)], -1)
    h = np_silu(np_linear(emb, sd["t_embedder.mlp.0.weight"], sd["t_embedder.mlp.0.bias"]))
    return np_linear(h, sd["t_embedder.mlp.2.weight"], sd["t_embedder.mlp.2.bias"])


def np_final(x, c, sd, p, cout):
    mod = np_linear(np_silu(c), sd["final_layer.adaLN_modulation.1.weight"],
                    sd["final_layer.adaLN_modulation.1.bias"])
    shift, scale = np.split(mod, 2, -1)
    x = np_modulate(np_ln(x), shift, scale)
    x = np_linear(x, sd["final_layer.linear.weight"], sd["final_layer.linear.bias"])
    b, tt, _ = x.shape
    g = int(np.sqrt(tt))
    x = x.reshape(b, g, g, p, p, cout)
    return np.einsum("nhwpqc->nchpwq", x).reshape(b, cout, g * p, g * p)


def rand_sd(shapes):
    return {k: RS.randn(*v).astype(np.float32) * 0.05 for k, v in shapes.items()}


def dit_state_dict(hidden=32, depth=2, heads=4, p=2, cin=4, classes=5, grid=4):
    shapes = {
        "x_embedder.proj.weight": (hidden, cin, p, p),
        "x_embedder.proj.bias": (hidden,),
        "t_embedder.mlp.0.weight": (hidden, 256), "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden), "t_embedder.mlp.2.bias": (hidden,),
        "y_embedder.embedding_table.weight": (classes + 1, hidden),
        "pos_embed": (1, grid * grid, hidden),
        "final_layer.linear.weight": (p * p * cin * 2, hidden),
        "final_layer.linear.bias": (p * p * cin * 2,),
        "final_layer.adaLN_modulation.1.weight": (2 * hidden, hidden),
        "final_layer.adaLN_modulation.1.bias": (2 * hidden,),
    }
    for i in range(depth):
        pre = f"blocks.{i}"
        shapes.update({
            f"{pre}.attn.qkv.weight": (3 * hidden, hidden), f"{pre}.attn.qkv.bias": (3 * hidden,),
            f"{pre}.attn.proj.weight": (hidden, hidden), f"{pre}.attn.proj.bias": (hidden,),
            f"{pre}.mlp.fc1.weight": (4 * hidden, hidden), f"{pre}.mlp.fc1.bias": (4 * hidden,),
            f"{pre}.mlp.fc2.weight": (hidden, 4 * hidden), f"{pre}.mlp.fc2.bias": (hidden,),
            f"{pre}.adaLN_modulation.1.weight": (6 * hidden, hidden),
            f"{pre}.adaLN_modulation.1.bias": (6 * hidden,),
        })
    sd = rand_sd(shapes)
    sd["pos_embed"] = get_2d_sincos_pos_embed(hidden, grid)[None].astype(np.float32)
    return sd


def test_dit_parity_vs_numpy_oracle():
    hidden, depth, heads, p, cin, classes, grid = 32, 2, 4, 2, 4, 5, 4
    sd = dit_state_dict(hidden, depth, heads, p, cin, classes, grid)
    model = DiT(input_size=grid * p, patch_size=p, in_channels=cin, hidden_size=hidden,
                depth=depth, num_heads=heads, num_classes=classes, learn_sigma=True)

    x = RS.randn(2, cin, grid * p, grid * p).astype(np.float32)
    t = np.array([7, 123], np.int64)
    y = np.array([0, 4], np.int64)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), jnp.asarray(y))
    params = convert_dit(sd, init)

    # numpy oracle
    tokens = np_patchify(x, sd, hidden, p) + sd["pos_embed"]
    c = np_t_embed(t, sd, hidden) + sd["y_embedder.embedding_table.weight"][y]
    for i in range(depth):
        tokens = np_block(tokens, c, sd, f"blocks.{i}", heads)
    want = np_final(tokens, c, sd, p, cin * 2)

    got = np.transpose(np.asarray(
        model.apply(params, x_j, jnp.asarray(t), jnp.asarray(y))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def mdt_state_dict(hidden=32, depth=6, heads=4, p=2, cin=4, classes=5, grid=4, decode_layer=2):
    half = (depth - decode_layer) // 2
    T = grid * grid
    shapes = {
        "x_embedder.proj.weight": (hidden, cin, p, p), "x_embedder.proj.bias": (hidden,),
        "t_embedder.mlp.0.weight": (hidden, 256), "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden), "t_embedder.mlp.2.bias": (hidden,),
        "y_embedder.embedding_table.weight": (classes + 1, hidden),
        "pos_embed": (1, T, hidden),
        "decoder_pos_embed": (1, T, hidden),
        "mask_token": (1, 1, hidden),
        "final_layer.linear.weight": (p * p * cin * 2, hidden),
        "final_layer.linear.bias": (p * p * cin * 2,),
        "final_layer.adaLN_modulation.1.weight": (2 * hidden, hidden),
        "final_layer.adaLN_modulation.1.bias": (2 * hidden,),
    }
    nrel = (2 * grid - 1) ** 2 + 3

    def block(pre, skip):
        s = {
            f"{pre}.attn.qkv.weight": (3 * hidden, hidden), f"{pre}.attn.qkv.bias": (3 * hidden,),
            f"{pre}.attn.proj.weight": (hidden, hidden), f"{pre}.attn.proj.bias": (hidden,),
            f"{pre}.attn.rel_pos_bias.relative_position_bias_table": (nrel, heads),
            f"{pre}.mlp.fc1.weight": (4 * hidden, hidden), f"{pre}.mlp.fc1.bias": (4 * hidden,),
            f"{pre}.mlp.fc2.weight": (hidden, 4 * hidden), f"{pre}.mlp.fc2.bias": (hidden,),
            f"{pre}.adaLN_modulation.1.weight": (6 * hidden, hidden),
            f"{pre}.adaLN_modulation.1.bias": (6 * hidden,),
        }
        if skip:
            s[f"{pre}.skip_linear.weight"] = (hidden, 2 * hidden)
            s[f"{pre}.skip_linear.bias"] = (hidden,)
        return s

    for i in range(half):
        shapes.update(block(f"en_inblocks.{i}", False))
        shapes.update(block(f"en_outblocks.{i}", True))
    for i in range(decode_layer):
        shapes.update(block(f"de_blocks.{i}", True))
    shapes.update(block("sideblocks.0", False))
    return rand_sd(shapes)


def test_mdt_inference_parity_vs_numpy_oracle():
    hidden, depth, heads, p, cin, classes, grid, dl = 32, 6, 4, 2, 4, 5, 4, 2
    half = (depth - dl) // 2
    sd = mdt_state_dict(hidden, depth, heads, p, cin, classes, grid, dl)
    model = MDTv2(input_size=grid * p, patch_size=p, in_channels=cin, hidden_size=hidden,
                  depth=depth, num_heads=heads, num_classes=classes, learn_sigma=True,
                  mask_ratio=0.3, decode_layer=dl)

    x = RS.randn(2, cin, grid * p, grid * p).astype(np.float32)
    t = np.array([9, 55], np.int64)
    y = np.array([1, 3], np.int64)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), jnp.asarray(y))
    params = convert_mdt(sd, init)

    # numpy oracle (inference path: no masking)
    idx = _relative_position_index(grid)

    def bias(pre):
        tab = sd[f"{pre}.attn.rel_pos_bias.relative_position_bias_table"]
        return tab[idx.reshape(-1)].reshape(grid * grid, grid * grid, heads).transpose(2, 0, 1)[None]

    tokens = np_patchify(x, sd, hidden, p) + sd["pos_embed"]
    c = np_t_embed(t, sd, hidden) + sd["y_embedder.embedding_table.weight"][y]
    input_skip = tokens.copy()
    skips = []
    for i in range(half):
        tokens = np_block(tokens, c, sd, f"en_inblocks.{i}", heads, rel_bias=bias(f"en_inblocks.{i}"))
        skips.append(tokens)
    for i in range(half):
        tokens = np_block(tokens, c, sd, f"en_outblocks.{i}", heads,
                          rel_bias=bias(f"en_outblocks.{i}"), skip=skips.pop())
    tokens = tokens + sd["decoder_pos_embed"]
    for i in range(dl):
        tokens = np_block(tokens, c, sd, f"de_blocks.{i}", heads,
                          rel_bias=bias(f"de_blocks.{i}"), skip=input_skip)
    want = np_final(tokens, c, sd, p, cin * 2)

    got = np.transpose(np.asarray(
        model.apply(params, x_j, jnp.asarray(t), jnp.asarray(y))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_dit_forward_with_cfg_shapes():
    model = DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
                num_heads=4, num_classes=5)
    x = jnp.zeros((4, 8, 8, 4))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.asarray([1, 2, 5, 5])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y, method=model.forward_with_cfg, cfg_scale=4.0)
    assert out.shape == (4, 8, 8, 8)
    # guided halves are identical
    np.testing.assert_allclose(np.asarray(out[..., :3][:2]), np.asarray(out[..., :3][2:]))


def test_mdt_masked_training_path_runs():
    model = MDTv2(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=6,
                  num_heads=4, num_classes=5, mask_ratio=0.3, decode_layer=2)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.asarray([0, 1])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y, enable_mask=True, len_keep=10,
                      mask_rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 8, 8, 8)


def test_mdt_forward_with_cfg_power_cosine():
    model = MDTv2(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=6,
                  num_heads=4, num_classes=5, mask_ratio=0.3, decode_layer=2)
    x = jnp.zeros((4, 8, 8, 4))
    t = jnp.full((4,), 500, jnp.int32)
    y = jnp.asarray([1, 2, 5, 5])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y, method=model.forward_with_cfg,
                      cfg_scale=4.0, diffusion_steps=1000)
    assert out.shape == (4, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out[..., :3][:2]), np.asarray(out[..., :3][2:]),
                               atol=1e-6)


def test_mdt_bucketed_len_keep_statistics():
    """Bucketed ratio draw matches the reference's continuous distribution
    (reference: models/mdt/model.py:463-467): same support, mean within one
    bucket width, and a bounded static-compile count."""
    from dmtpu.models.mdt import sample_len_keep

    L, mr, nb = 256, 0.30, 8
    rs = np.random.RandomState(0)
    us = rs.rand(20000)
    got = np.array([sample_len_keep(L, mr, u, n_buckets=nb) for u in us])
    want = np.floor(L * (1 - (mr + 0.2 * us)))  # reference int(L*(1-r))

    lo, hi = 128, 179  # exact support of int(256·(1-r)), r ~ U[0.3, 0.5)
    assert got.min() >= lo and got.max() <= hi
    assert want.min() >= lo  # the reference draw never keeps fewer either
    assert len(np.unique(got)) <= nb          # static compile budget
    bucket_width = (hi - lo) / (nb - 1)
    assert abs(got.mean() - want.mean()) < bucket_width

    # every bucket feeds the model's static len_keep path
    model = MDTv2(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=4,
                  num_heads=4, num_classes=5, mask_ratio=mr, decode_layer=2)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.asarray([0, 1])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    lk = sample_len_keep(16, mr, 0.5, n_buckets=4)
    out = model.apply(params, x, t, y, enable_mask=True, len_keep=lk,
                      mask_rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 8, 8, 8)
