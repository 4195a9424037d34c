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
    """Multi-head attention, [B, S, H, D] -> [B, S, H, D]; f32 softmax.

    Logits are produced in the *input* dtype and the softmax is computed in
    f32 on them — the reference's half-precision attention structure exactly
    (reference: models/adm/unet.py:356-371: fp16 ``(q*scale)·(k*scale)``
    einsum, ``softmax(weight.float())`` cast back).  f32 inputs therefore get
    full-precision logits; bf16 torsos get bf16 logits, which halves the S×S
    HBM traffic XLA materialises around the softmax (measured 2.8× on v5e at
    S=256).  Only for small S×S though — at S=4096 XLA lays the bf16
    intermediate out badly and f32 is 2× faster (measured), so big logits
    stay f32 (long sequences normally ride the flash path anyway).
    """
    *_, d = q.shape
    sq, sk = q.shape[1], k.shape[1]
    scale = (d ** -0.5) if scale is None else scale
    root = scale ** 0.5
    if sq * sk <= 2 ** 21:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * root, k * root)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk",
                            q.astype(jnp.float32) * root,
                            k.astype(jnp.float32) * root)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _pallas_flash():
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        return fa
    except Exception:  # pragma: no cover
        return None


def _should_use_flash(b: int, sq: int, sk: int, h: int, d: int,
                      prefer_flash: bool = False) -> bool:
    """Flash-vs-XLA dispatch for [B, S, H, D] attention on TPU.

    The Pallas kernel pads head_dim to the 128-wide lane register; below
    d=64 that wastes >2× MXU work, and measured on v5e the XLA path
    overtakes it once enough (batch × heads) rows keep the MXU fed
    (B16·H8 S4096 d40: XLA 6.5ms vs flash 8.7ms; B4: flash 2.0 vs 5.9).
    Only up to S=4096² logits though: past that the S×S materialisation the
    XLA path implies stops fitting (e.g. S=16384 at b·h=128 would be a
    ~137 GB f32 weight tensor) — flash must take it regardless of d.

    ``prefer_flash`` disables the XLA-beats-flash heuristic: when the op will
    be DIFFERENTIATED (training), the XLA path's backward materialises the
    full f32 S×S logits (8 GB at b16·h8·S4096 — an instant OOM on one v5e),
    so callers in training graphs must prefer the flash kernel whenever its
    shape constraints allow.
    """
    pad_wasteful = (not prefer_flash and d < 64 and b * h >= 128
                    and sq * sk <= 4096 * 4096)
    return (
        not pad_wasteful
        and min(sq, sk) >= _FLASH_MIN_SEQ
        and sq % 128 == 0
        and sk % 128 == 0
        and d >= 32
    )


def _use_small_d(sq: int, sk: int, d: int, prefer_flash: bool = False) -> bool:
    """Small-d routing gate (round 4): the fused flash_small_d kernel replaces
    the stock kernels at SD's d=40/80 self-attention shapes.

    Chip-measured on v5e (docs/ROADMAP.md round-4 attention table):
    - TRAINING (differentiated, ``prefer_flash=True``): the fused
      single-kernel backward wins big — SD1.5 512² b16 train 27.4 img/s vs
      19.6 with the stock flash kernels (+40%) — so it is the DEFAULT.
    - SAMPLING (forward-only): the XLA one-shot path still wins (2.76 vs
      2.37 samples/s headline A/B) — default stays XLA.
    DMTPU_SMALL_D=1 forces the kernel everywhere and =0 disables it
    everywhere, keeping the single-env A/B for both paths.

    Measurement scope: the chip A/B covered SD's d=40 (S=4096) and d=80
    (S=1024) shapes.  Other small-d shapes the gate admits (e.g. SDXL's
    d=64 at S%1024==0) are EXTRAPOLATED — the fused 5-matmul backward's
    advantage grows as d shrinks below the 128-lane pad, so the win should
    hold at d<=80 and shrink toward d=128 — but they are not chip-measured;
    DMTPU_SMALL_D=0 is the escape hatch if a new shape regresses."""
    import os

    if d >= 128:
        return False
    env = os.environ.get("DMTPU_SMALL_D", "")
    if env == "0" or (env != "1" and not prefer_flash):
        return False
    try:
        # after the env short-circuit: flash_small_d imports pallas TPU
        # modules at top level, and a pallas-less JAX build must keep the
        # plain mha fallback (same contract as _pallas_flash's try/except)
        from dmtpu.ops import flash_small_d as _fsd
    except Exception:  # pragma: no cover
        return False
    return _fsd.supported(sq, sk, d)


def flash_mha(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    prefer_flash: bool = False,
) -> Array:
    """Flash attention on TPU for long sequences; XLA fallback otherwise.

    [B, S, H, D] layout.  Cross-attention (k/v sequence differing from q's)
    is supported.  Set ``prefer_flash=True`` in training graphs — see
    ``_should_use_flash``.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    fa = _pallas_flash()

    use_small_d = _use_small_d(sq, sk, d, prefer_flash)
    if fa is None or not (
            use_small_d or _should_use_flash(b, sq, sk, h, d, prefer_flash)):
        return mha(q, k, v, scale=scale)

    sm_scale = (d ** -0.5) if scale is None else scale

    def _block(s: int, target: int) -> int:
        # largest power-of-two block ≤ target that divides s; terminates at
        # 128 because the use_flash gate guarantees s % 128 == 0.
        while s % target:
            target //= 2
        return target

    # Default BlockSizes serialise badly at LDM shapes (S=4096, d≤80:
    # 13.8ms → 2.0ms with 512/1024 blocks, measured on v5e).  Blocks must
    # divide the sequence (S=1536 with block_k=1024 is a trace-time error).
    # Backward blocks MUST also be set: differentiating the kernel (training
    # through flash attention) is a trace-time error without them.
    bq = _block(sq, min(512, sq))
    bk = _block(sk, min(1024, sk))
    # backward blocks stay at 256: the dq/dkv kernels hold more operands per
    # block, and 512/1024 backward tiles fail Mosaic compilation at LDM shapes
    bqb = _block(sq, min(256, sq))
    bkb = _block(sk, min(256, sk))
    block_sizes = fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bqb, block_k_major_dkv=bkb, block_k_dkv=bkb,
        block_q_dkv=bqb, block_k_major_dq=bkb, block_k_dq=bkb, block_q_dq=bqb)

    def _flash(q, k, v):
        if use_small_d:
            from dmtpu.ops import flash_small_d as _fsd
            return _fsd.flash_small_d_bshd(q, k, v, sm_scale).astype(q.dtype)
        # pallas kernel expects [B, H, S, D] and applies sm_scale to q.
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out = fa.flash_attention(qt, kt, vt, sm_scale=sm_scale, causal=False,
                                 block_sizes=block_sizes)
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)

    # Branch per *lowering* platform: under the axon tunnel the global device
    # list says TPU even when this computation is being compiled for the
    # (virtual-mesh) CPU client, where the Pallas TPU kernel cannot lower.
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=_flash,
        default=lambda q, k, v: mha(q, k, v, scale=scale),
    )
