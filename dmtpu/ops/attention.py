"""Attention ops: XLA reference path + TPU flash-attention path.

The reference repo relies on torch matmuls (reference: models/modules.py:89-102)
and optionally xformers memory-efficient attention
(reference: models/stablediffusion/attention.py:177).  Here:

- ``mha``: plain XLA attention with ADM-style numerically-stable scaling —
  both q and k are pre-scaled by ``sqrt(scale)`` so the matmul never leaves
  the well-conditioned range (reference: models/adm/unet.py:356-371), and the
  softmax always accumulates in float32.
- ``flash_mha``: tiled Pallas TPU flash-attention (no S×S materialisation)
  for long sequences; falls back to ``mha`` off-TPU or for short sequences
  where the XLA fused path is already optimal.

All shapes are **[B, S, H, D]** (batch, sequence, heads, head_dim).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# below this many tokens the S×S XLA path fits comfortably in VMEM and wins
_FLASH_MIN_SEQ = 1024


def mha(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
) -> Array:
    """Multi-head attention, [B, S, H, D] -> [B, S, H, D]; f32 softmax."""
    *_, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    root = scale ** 0.5
    qf = q.astype(jnp.float32) * root
    kf = k.astype(jnp.float32) * root
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=1)
def _pallas_flash():
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        return fa
    except Exception:  # pragma: no cover
        return None


def flash_mha(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
) -> Array:
    """Flash attention on TPU for long sequences; XLA fallback otherwise.

    [B, S, H, D] layout.  Cross-attention (k/v sequence differing from q's)
    is supported.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    fa = _pallas_flash()
    use_flash = (
        fa is not None
        and min(sq, sk) >= _FLASH_MIN_SEQ
        and sq % 128 == 0
        and sk % 128 == 0
        and d >= 32
    )
    if not use_flash:
        return mha(q, k, v, scale=scale)

    sm_scale = (d ** -0.5) if scale is None else scale

    def _flash(q, k, v):
        # pallas kernel expects [B, H, S, D] and applies sm_scale to q.
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out = fa.flash_attention(qt, kt, vt, sm_scale=sm_scale, causal=False)
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)

    # Branch per *lowering* platform: under the axon tunnel the global device
    # list says TPU even when this computation is being compiled for the
    # (virtual-mesh) CPU client, where the Pallas TPU kernel cannot lower.
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=_flash,
        default=lambda q, k, v: mha(q, k, v, scale=scale),
    )
