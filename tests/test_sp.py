"""Sequence-parallel ring attention (dmtpu/parallel/sp.py) on the 8-device
CPU mesh: numerics vs single-device attention, gradients through the ring,
dtype islands, and the divisibility guard."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.parallel.mesh import make_mesh
from dmtpu.parallel.sp import sp_attention


def _reference_mha(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return o.transpose(0, 2, 1, 3).astype(q.dtype)


def _mesh(fsdp):
    devs = jax.devices("cpu")
    assert len(devs) == 8
    return make_mesh(devs, fsdp=fsdp)


@pytest.mark.parametrize("fsdp", [2, 4])
def test_ring_matches_reference(fsdp):
    mesh = _mesh(fsdp)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, s, h, d = 2, 32, 3, 8
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.float32) for kk in ks)
    got = sp_attention(q, k, v, mesh)
    want = _reference_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_bf16_f32_softmax_island():
    mesh = _mesh(4)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 16, 2, 4), jnp.bfloat16) for kk in ks)
    got = sp_attention(q, k, v, mesh)
    assert got.dtype == jnp.bfloat16
    want = _reference_mha(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_ring_gradients_match_reference():
    """The VJP rides the transposed ring — grads equal the dense attention's."""
    mesh = _mesh(4)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    b, s, h, d = 1, 16, 2, 4
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.float32) for kk in ks)

    def loss_sp(q_, k_, v_):
        return jnp.sum(jnp.sin(sp_attention(q_, k_, v_, mesh)))

    def loss_ref(q_, k_, v_):
        return jnp.sum(jnp.sin(_reference_mha(q_, k_, v_)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5)


def test_ring_rejects_indivisible_sequence():
    mesh = _mesh(4)
    q = jnp.zeros((1, 15, 2, 4))
    with pytest.raises(ValueError, match="not divisible"):
        sp_attention(q, q, q, mesh)
