"""Pallas-kernel ops: numerical parity with XLA references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.ops.groupnorm import group_norm_silu, group_norm_silu_reference


@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_silu_matches_flax(silu):
    """Reference path == flax GroupNorm (+ silu)."""
    from flax import linen as nn

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 128).astype(np.float32))
    scale = jnp.asarray(rs.randn(128).astype(np.float32))
    bias = jnp.asarray(rs.randn(128).astype(np.float32))

    got = group_norm_silu_reference(x, scale, bias, groups=32, silu=silu)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    if silu:
        want = want * jax.nn.sigmoid(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_grad():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 4, 128).astype(np.float32))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, 32) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_silu_reference(x, s, b, 32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_pallas_interpret():
    """Run the actual pallas kernel in interpreter mode and compare."""
    from jax.experimental.pallas import tpu as pltpu

    from dmtpu.ops import groupnorm

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 4, 4, 128).astype(np.float32))
    scale = jnp.asarray(rs.randn(128).astype(np.float32))
    bias = jnp.asarray(rs.randn(128).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = groupnorm._pallas_forward(x, scale, bias, 32, 1e-5, True)
    want = group_norm_silu_reference(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
