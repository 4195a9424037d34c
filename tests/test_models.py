"""Trainable-model parity: shapes and parameter counts vs the reference zoo."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.models import UNet, UNetCategorialAdaGN, EMAState
from tests.conftest import require_reference


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_unet_shapes_and_param_count():
    require_reference()
    import torch
    from models.unet import UNet as RefUNet

    model = UNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2,)))
    out = model.apply(params, jnp.zeros((2, 32, 32, 3)), jnp.arange(2))
    assert out.shape == (2, 32, 32, 3)

    ref = RefUNet()
    ref_count = sum(p.numel() for p in ref.parameters())
    assert n_params(params) == ref_count


def test_unet_large_config():
    require_reference()
    from models.unet import UNet as RefUNet

    kw = dict(in_channels=1, out_channels=1, dim=32,
              dim_mults=[1, 1, 2, 2], use_attn=[False, False, True, False], dropout=0.0)
    model = UNet(**kw)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,)))
    out = model.apply(params, jnp.zeros((1, 64, 64, 1)), jnp.arange(1))
    assert out.shape == (1, 64, 64, 1)

    ref = RefUNet(**kw)
    assert n_params(params) == sum(p.numel() for p in ref.parameters())


@pytest.mark.parametrize("resblock_updown", [True, False])
def test_unet_adagn_shapes_and_param_count(resblock_updown):
    require_reference()
    from models.unet_categorial_adagn import UNetCategorialAdaGN as RefUNet

    kw = dict(dim=32, dim_mults=[1, 2], use_attn=[False, True], num_classes=10,
              attn_head_dims=16, resblock_updown=resblock_updown)
    model = UNetCategorialAdaGN(**kw)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)), jnp.zeros((2,), jnp.int32)
    )
    out = model.apply(params, jnp.zeros((2, 16, 16, 3)), jnp.arange(2), jnp.arange(2))
    assert out.shape == (2, 16, 16, 3)

    ref = RefUNet(**kw)
    # ours has one extra zero-init null-class embedding row (dim*4 params)
    assert n_params(params) == sum(p.numel() for p in ref.parameters()) + 32 * 4


def test_unet_adagn_null_class_equals_no_class():
    """y = num_classes (null row, zero-init) must equal the unconditional path."""
    model = UNetCategorialAdaGN(dim=32, dim_mults=[1, 2], use_attn=[False, False], num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.asarray([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t, jnp.zeros((2,), jnp.int32))
    out_null = model.apply(params, x, t, jnp.full((2,), 10, jnp.int32))
    out_none = model.apply(params, x, t, None)
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_none), atol=1e-6)


def test_ema_numeric_trace():
    """Reproduce the reference's hand-traced EMA expectations.

    (reference: models/ema.py:82-121: 0 -> 0.1 -> 0.29, apply/restore)
    """
    params = {"w": jnp.zeros((3,))}
    ema = EMAState.create(params, decay=0.9, gradual=False)

    params = {"w": jnp.ones((3,))}
    ema = ema.update(params)
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.1, rtol=1e-6)

    params = {"w": jnp.full((3,), 2.0)}
    ema = ema.update(params)
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.29, rtol=1e-6)
    assert int(ema.num_updates) == 2


def test_ema_gradual_decay():
    params = {"w": jnp.zeros(())}
    ema = EMAState.create(params, decay=0.9999, gradual=True)
    # after first update decay = min(0.9999, 2/11)
    ema = ema.update({"w": jnp.ones(())})
    expect = 0.0 - (1 - 2 / 11) * (0.0 - 1.0)
    np.testing.assert_allclose(float(ema.shadow["w"]), expect, rtol=1e-6)


def test_ema_bf16_shadow():
    """``dtype='bfloat16'`` halves the shadow's HBM: float leaves are stored
    bf16 (non-float leaves untouched), the update arithmetic still runs in
    f32 (params dtype) and tracks the f32 EMA within bf16 resolution, and
    the TrainState plumbing passes ``ema_dtype`` through."""
    from dmtpu.parallel import TrainState

    params = {"w": jnp.full((4,), 0.5, jnp.float32), "idx": jnp.arange(3)}
    ema16 = EMAState.create(params, decay=0.9, gradual=False, dtype="bfloat16")
    ema32 = EMAState.create(params, decay=0.9, gradual=False)
    assert ema16.shadow["w"].dtype == jnp.bfloat16
    assert ema16.shadow["idx"].dtype == params["idx"].dtype
    for step in range(3):
        newp = {"w": jnp.full((4,), 1.0 + step, jnp.float32), "idx": jnp.arange(3)}
        ema16, ema32 = ema16.update(newp), ema32.update(newp)
    assert ema16.shadow["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ema16.shadow["w"], np.float32),
                               np.asarray(ema32.shadow["w"]), rtol=1e-2)

    import optax

    st = TrainState.create({"w": jnp.ones((2,))}, optax.sgd(0.1),
                           ema_decay=0.999, ema_dtype="bfloat16")
    assert st.ema.shadow["w"].dtype == jnp.bfloat16


def test_attention_block_matches_naive():
    """ops.mha equals an explicit softmax attention computation."""
    from dmtpu.ops import mha

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 16, 4, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 16, 4, 8).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 16, 4, 8).astype(np.float32))
    got = mha(q, k, v)
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", w, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
