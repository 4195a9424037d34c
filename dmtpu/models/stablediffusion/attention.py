"""SD cross-attention transformer blocks, in Flax.

Architecture parity with reference: models/stablediffusion/attention.py
(GEGLU :46-53, FeedForward :56-72, CrossAttention :89-141,
BasicTransformerBlock :199-228, SpatialTransformer :231-285) and the SDXL
variants (reference: models/sdxl/attention.py:152-575 — same layouts).

The reference's optional xformers memory-efficient attention becomes the
Pallas flash path in ``dmtpu.ops.attention`` (long sequences) with f32
softmax everywhere (the reference forces fp32 sim, :117-122).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.ops.attention import flash_mha
from dmtpu.ops.tome import bipartite_soft_matching_2d, identity_merge, tome_r

Array = jax.Array


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        xg = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        inner = int(d * self.mult)
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="net__0")(x)
        else:
            h = nn.Dense(inner, dtype=self.dtype, name="net__0__0")(x)
            h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(d, dtype=self.dtype, name="net__2")(h)


class CrossAttention(nn.Module):
    """Self- or cross-attention with flash path; q/k/v have no bias.

    ``prefer_flash`` (training graphs) makes the dispatch choose the Pallas
    kernel over the XLA S-by-S path whenever its shape constraints allow —
    the XLA path's backward materialises the full f32 logits tensor
    (dmtpu/ops/attention.py::_should_use_flash)."""

    heads: int = 8
    dim_head: int = 64
    prefer_flash: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        d = x.shape[-1]
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, tq, _ = q.shape
        tk = k.shape[1]
        out = flash_mha(
            q.reshape(b, tq, self.heads, self.dim_head),
            k.reshape(b, tk, self.heads, self.dim_head),
            v.reshape(b, tk, self.heads, self.dim_head),
            prefer_flash=self.prefer_flash,
        ).reshape(b, tq, inner)
        # tag for the "attn" selective-remat policy: saving this one tensor
        # (S x inner, small) spares the backward a full recompute of the
        # flash forward kernel — the costliest recompute in the SD torso
        # (dmtpu/ops/rematerialize.py).  Identity unless the policy asks.
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_out")
        return nn.Dense(d, dtype=self.dtype, name="to_out__0")(out)


class BasicTransformerBlock(nn.Module):
    """(reference: models/stablediffusion/attention.py:199-228)

    ``tome_ratio > 0`` (serving only; adds NO params) turns on Token Merging
    around the self-attention: the block input picks the matching (tomesd's
    call structure), attn1 runs on ``N - r`` tokens, and the output is
    unmerged before the residual add (``dmtpu/ops/tome.py``).  Skipped when
    attn1 is actually cross-attention (``disable_self_attn``)."""

    n_heads: int
    d_head: int
    gated_ff: bool = True
    disable_self_attn: bool = False
    prefer_flash: bool = False
    tome_ratio: float = 0.0
    tome_sx: int = 2
    tome_sy: int = 2
    tome_seed: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 hw: Optional[Sequence[int]] = None) -> Array:
        merge, unmerge = identity_merge()
        if self.tome_ratio > 0 and hw is not None and not self.disable_self_attn:
            h, w = hw
            r = tome_r(x.shape[1], self.tome_ratio, h, w, self.tome_sx, self.tome_sy)
            if r > 0:
                merge, unmerge = bipartite_soft_matching_2d(
                    x, h, w, sx=self.tome_sx, sy=self.tome_sy, r=r,
                    seed=self.tome_seed)
        x = unmerge(CrossAttention(self.n_heads, self.d_head,
                                   prefer_flash=self.prefer_flash,
                                   dtype=self.dtype, name="attn1")(
            merge(nn.LayerNorm(epsilon=1e-5, name="norm1")(x)),
            context=context if self.disable_self_attn else None)) + x
        x = CrossAttention(self.n_heads, self.d_head, prefer_flash=self.prefer_flash,
                           dtype=self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context=context) + x
        x = FeedForward(glu=self.gated_ff, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """(reference: models/stablediffusion/attention.py:231-285)"""

    n_heads: int
    d_head: int
    depth: int = 1
    disable_self_attn: bool = False
    use_linear: bool = False
    prefer_flash: bool = False
    tome_ratio: float = 0.0
    tome_sx: int = 2
    tome_sy: int = 2
    tome_seed: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        if not self.use_linear:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, x.shape[-1])
        if self.use_linear:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.n_heads, self.d_head,
                                      disable_self_attn=self.disable_self_attn,
                                      prefer_flash=self.prefer_flash,
                                      tome_ratio=self.tome_ratio,
                                      tome_sx=self.tome_sx, tome_sy=self.tome_sy,
                                      tome_seed=self.tome_seed,
                                      dtype=self.dtype, name=f"transformer_blocks__{i}")(
                x, context=context, hw=(h, w))
        if self.use_linear:
            x = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                         name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                        name="proj_out")(x)
        return x + x_in
