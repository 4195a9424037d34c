"""dmtpu/ops/flash_small_d.py — numerics vs dense attention (interpret mode).

The kernel targets the real chip; these tests run it through the Pallas TPU
interpreter on CPU, checking the forward, the logsumexp residual, and all
three gradients (the fused single-kernel backward with the revisited dq
accumulator) against a plain dense softmax-attention reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dmtpu.ops.flash_small_d import flash_small_d, flash_small_d_bshd, supported

CPU = jax.devices("cpu")[0]


def dense_attn(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("d", [40, 80])
def test_fwd_matches_dense(d):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    bh, s = 4, 512
    q = jax.random.normal(kq, (bh, s, d))
    k = jax.random.normal(kk, (bh, s, d))
    v = jax.random.normal(kv, (bh, s, d))
    scale = d ** -0.5
    with jax.default_device(CPU), pltpu.force_tpu_interpret_mode():
        out = flash_small_d(q, k, v, scale, block_q=128, block_k=256)
    want = dense_attn(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_dense():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    bh, s, d = 2, 512, 40
    q = jax.random.normal(kq, (bh, s, d))
    k = jax.random.normal(kk, (bh, s, d))
    v = jax.random.normal(kv, (bh, s, d))
    g = jax.random.normal(kg, (bh, s, d))
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_small_d(q, k, v, scale, 128, 256) * g)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attn(q, k, v, scale) * g)

    with jax.default_device(CPU), pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_bf16_and_bshd_wrapper():
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    b, s, h, d = 2, 256, 3, 40
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    scale = d ** -0.5
    with jax.default_device(CPU), pltpu.force_tpu_interpret_mode():
        out = flash_small_d_bshd(q, k, v, scale, block_q=128, block_k=128)
    qf = jnp.swapaxes(q, 1, 2).reshape(b * h, s, d)
    kf = jnp.swapaxes(k, 1, 2).reshape(b * h, s, d)
    vf = jnp.swapaxes(v, 1, 2).reshape(b * h, s, d)
    want = jnp.swapaxes(dense_attn(qf, kf, vf, scale).reshape(b, h, s, d), 1, 2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_supported_gate():
    assert supported(4096, 4096, 40)
    assert supported(1024, 1024, 80, block_q=512, block_k=1024)
    assert not supported(4096, 77, 40)       # cross-attention
    assert not supported(4096, 4096, 160)    # d > 128
    assert not supported(1000, 1000, 40)     # unaligned S


def test_unsupported_shapes_raise():
    """Misaligned S must fail loudly at trace time, not silently attend to a
    truncated key range (S=1536 with block_k=1024 would drop keys 1024+)."""
    q = jnp.zeros((2, 1536, 40))
    with pytest.raises(ValueError, match="flash_small_d"):
        flash_small_d(q, q, q, 0.1, 512, 1024)
    with pytest.raises(ValueError, match="flash_small_d"):
        jax.grad(lambda x: flash_small_d(x, x, x, 0.1, 512, 1024).sum())(q)


def test_bf16_grads_accumulate_in_f32():
    """The revisited dq block must accumulate in f32: with bf16 inputs the
    kernel's grads should match the f32 dense reference to bf16 resolution
    even when the dq row is read-modify-written across several k blocks
    (s=512, block_k=128 -> 4 partial sums per row)."""
    rng = jax.random.PRNGKey(3)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    bh, s, d = 2, 512, 40
    qf = jax.random.normal(kq, (bh, s, d))
    kf = jax.random.normal(kk, (bh, s, d))
    vf = jax.random.normal(kv, (bh, s, d))
    g = jax.random.normal(kg, (bh, s, d))
    scale = d ** -0.5

    def loss_flash(q, k, v):
        out = flash_small_d(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16), scale, 128, 128)
        return jnp.sum(out.astype(jnp.float32) * g)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attn(q, k, v, scale) * g)

    with jax.default_device(CPU), pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(qf, kf, vf)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(qf, kf, vf)
    for name, a, b in zip("qkv", got, want):
        # tolerance = bf16 rounding of inputs/P, NOT accumulation drift
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.05,
                                   err_msg=f"d{name} mismatch (bf16)")
