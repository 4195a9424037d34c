"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Every ResBlock in the zoo starts with GroupNorm32 → SiLU → Conv
(reference: models/unet.py:14-18, models/adm/unet.py:201-205).  GroupNorm is
memory-bound: XLA executes it as separate stat/normalise passes over HBM.
This kernel does ONE read and ONE write per element: each grid program loads
a batch row's full [H*W, C] tile into VMEM, computes per-group statistics in
f32 on the VPU, normalises, applies scale/shift and (optionally) SiLU, and
writes back.

Falls back to plain XLA off-TPU or when the tile exceeds the VMEM budget.
Differentiable via custom_vjp (backward rematerialises through the XLA
reference implementation — correct, and the forward stays fused).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024  # per-program input tile budget


def group_norm_silu_reference(
    x: Array, scale: Array, bias: Array, groups: int, eps: float = 1e-5,
    silu: bool = True,
) -> Array:
    """Plain-XLA reference (also the fallback and the VJP path).  NHWC."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int, eps: float, silu: bool):
    """Group stats via one-hot matmuls — no lane-dim reshapes (Mosaic-friendly)."""
    import jax.numpy as jnp  # noqa: F811

    x = x_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    x = x.reshape(-1, c)                       # [HW, C] (block may carry a unit batch dim)
    hw = x.shape[0]
    cg = c // groups
    n = float(hw * cg)

    # one-hot channel->group matrix [C, G]
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    M = (ch_ids == g_ids).astype(jnp.float32)

    col_sum = jnp.sum(x, axis=0, keepdims=True)            # [1, C]
    col_sq = jnp.sum(x * x, axis=0, keepdims=True)         # [1, C]
    mean_g = jnp.dot(col_sum, M, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / n   # [1, G]
    ex2_g = jnp.dot(col_sq, M, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / n     # [1, G]
    var_g = ex2_g - mean_g * mean_g
    # broadcast group stats back to channels
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)      # [1, C]
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), M.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    xn = (x - mean_c) * rstd_c
    xn = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if silu:
        xn = xn * jax.nn.sigmoid(xn)
    out_ref[:] = xn.reshape(out_ref.shape).astype(out_ref.dtype)


def _pallas_forward(x: Array, scale: Array, bias: Array, groups: int, eps: float,
                    silu: bool) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    x2 = x.reshape(b, h * w, c)
    kernel = functools.partial(_kernel, groups=groups, eps=eps, silu=silu)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
    )(x2, scale, bias)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(x: Array, scale: Array, bias: Array, groups: int = 32,
                    eps: float = 1e-5, silu: bool = True) -> Array:
    """Fused GroupNorm(+SiLU), NHWC.  scale/bias: [C]."""
    b, h, w, c = x.shape
    fits = (h * w) * c * 4 <= _VMEM_BUDGET_BYTES and c % 128 == 0 and c % groups == 0
    if not fits:
        return group_norm_silu_reference(x, scale, bias, groups, eps, silu)
    # Branch per LOWERING platform, not the trace-time device list: under the
    # axon tunnel jax.devices() says TPU even while this computation compiles
    # for the virtual CPU mesh, where the Pallas TPU kernel cannot lower
    # (same rationale as dmtpu.ops.attention.flash_mha).
    return jax.lax.platform_dependent(
        x, scale, bias,
        tpu=lambda xx, ss, bb: _pallas_forward(xx, ss, bb, groups, eps, silu),
        default=lambda xx, ss, bb: group_norm_silu_reference(xx, ss, bb, groups, eps, silu),
    )


def _fwd(x, scale, bias, groups, eps, silu):
    return group_norm_silu(x, scale, bias, groups, eps, silu), (x, scale, bias)


def _bwd(groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu_reference(xx, ss, bb, groups, eps, silu),
        x, scale, bias,
    )
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)
