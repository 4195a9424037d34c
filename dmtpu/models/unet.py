"""The repo's trainable DDPM UNet, re-designed for TPU in Flax/NHWC.

Architecture parity with reference: models/unet.py:46-152 (GroupNorm32+SiLU
+3x3-conv ResBlocks, additive time-embedding injection, single-head
self-attention at selected stages, skip concatenation on the channel axis).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.modules import (
    Conv,
    FusedGNSiLU,
    Dense,
    Downsample,
    SelfAttentionBlock,
    SinusoidalPosEmb,
    Upsample,
)

Array = jax.Array


class ResBlock(nn.Module):
    """GN-SiLU-Conv x2 with additive time embedding.  (reference: models/unet.py:10-43)

    ``dtype``: compute dtype for convs/denses (bf16 torso on TPU); GroupNorm
    statistics always accumulate in f32.
    """

    out_channels: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    fused_gn: bool = False  # Pallas fused GroupNorm+SiLU (param-compatible)

    @nn.compact
    def __call__(self, x: Array, time_embed: Optional[Array] = None, *, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        shortcut = x if in_ch == self.out_channels else Conv(self.out_channels, 1, 1, 0, dtype=self.dtype, name="shortcut")(x)
        if self.fused_gn:
            h = FusedGNSiLU(32, name="norm1")(x).astype(x.dtype)
        else:
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
            h = jax.nn.silu(h)
        h = Conv(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv1")(h)
        if time_embed is not None:
            h = h + Dense(self.out_channels, dtype=self.dtype, name="proj")(jax.nn.silu(time_embed))[:, None, None, :].astype(h.dtype)
        if self.fused_gn:
            h = FusedGNSiLU(32, name="norm2")(h).astype(h.dtype)
        else:
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="norm2")(h).astype(h.dtype)
            h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        return h + shortcut


class UNet(nn.Module):
    """(reference: models/unet.py:46-152)"""

    in_channels: int = 3
    out_channels: int = 3
    dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    use_attn: Sequence[bool] = (False, True, False, False)
    num_res_blocks: int = 2
    n_heads: int = 1
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x: Array, t: Array, *, train: bool = False) -> Array:
        x = x.astype(self.dtype) if self.dtype else x
        n_stages = len(self.dim_mults)
        ted = self.dim * 4
        emb = SinusoidalPosEmb(self.dim)(t)
        emb = Dense(ted, name="time_embed_1")(emb)
        emb = Dense(ted, name="time_embed_2")(jax.nn.silu(emb))

        h = Conv(self.dim, 3, 1, 1, dtype=self.dtype, name="first_conv")(x)
        skips = [h]

        # down path
        for i in range(n_stages):
            out_dim = self.dim * self.dim_mults[i]
            for j in range(self.num_res_blocks):
                h = ResBlock(out_dim, self.dropout, dtype=self.dtype, fused_gn=self.fused_gn, name=f"down_{i}_res_{j}")(h, emb, train=train)
                if self.use_attn[i]:
                    h = SelfAttentionBlock(out_dim, self.n_heads, dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
                skips.append(h)
            if i < n_stages - 1:
                h = Downsample(out_dim, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # bottleneck
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype, fused_gn=self.fused_gn, name="mid_res_1")(h, emb, train=train)
        h = SelfAttentionBlock(h.shape[-1], 1, dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype, fused_gn=self.fused_gn, name="mid_res_2")(h, emb, train=train)

        # up path
        for idx, i in enumerate(range(n_stages - 1, -1, -1)):
            out_dim = self.dim * self.dim_mults[i]
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(out_dim, self.dropout, dtype=self.dtype, fused_gn=self.fused_gn, name=f"up_{i}_res_{j}")(h, emb, train=train)
                if self.use_attn[i]:
                    h = SelfAttentionBlock(out_dim, self.n_heads, dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i > 0:
                h = Upsample(out_dim, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="last_norm")(h.astype(jnp.float32))
        h = Conv(self.out_channels, 3, 1, 1, name="last_conv")(jax.nn.silu(h))
        return h
