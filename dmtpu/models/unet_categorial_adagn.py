"""Class-conditional UNet with AdaGN conditioning, Flax/NHWC.

Architecture parity with reference: models/unet_categorial_adagn.py:75-208
(AdaGN scale-shift conditioning on time+class embedding, ResBlock-based
up/downsampling, multi-head attention sized by head dim).

The unconditional branch (reference passes ``y=None``) is encoded as the
null label ``y == num_classes``: the embedding table has one extra row that
is zero-initialised, so ``y=num_classes`` reproduces ``y=None`` exactly and
stays shape-static for classifier-free guidance's batched dual call.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.modules import (
    AdaGN,
    Conv,
    Dense,
    Downsample,
    SelfAttentionBlock,
    SinusoidalPosEmb,
    Upsample,
)

Array = jax.Array


class ResBlockAdaGN(nn.Module):
    """(reference: models/unet_categorial_adagn.py:12-72)"""

    out_channels: int
    dropout: float = 0.1
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x: Array, embed: Array, *, train: bool = False) -> Array:
        assert not (self.up and self.down)

        def updown(z: Array) -> Array:
            b, hh, ww, c = z.shape
            if self.up:
                return jax.image.resize(z, (b, 2 * hh, 2 * ww, c), method="nearest")
            if self.down:
                return nn.avg_pool(z, (2, 2), strides=(2, 2))
            return z

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm1")(x)
        h = jax.nn.silu(h)
        if self.up or self.down:
            h = updown(h)
            x = updown(x)
        h = Conv(self.out_channels, 3, 1, 1, name="conv1")(h)
        h = AdaGN(32, self.out_channels, embed.shape[-1], name="adagn")(h, embed)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv(self.out_channels, 3, 1, 1, name="conv2")(h)
        shortcut = x if x.shape[-1] == self.out_channels else Conv(self.out_channels, 1, 1, 0, name="shortcut")(x)
        return h + shortcut


class UNetCategorialAdaGN(nn.Module):
    """(reference: models/unet_categorial_adagn.py:75-208)"""

    in_channels: int = 3
    out_channels: int = 3
    dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    use_attn: Sequence[bool] = (False, True, True, False)
    num_res_blocks: int = 2
    num_classes: Optional[int] = None
    attn_head_dims: int = 64
    resblock_updown: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Optional[Array] = None, *, train: bool = False) -> Array:
        n_stages = len(self.dim_mults)
        ted = self.dim * 4
        emb = SinusoidalPosEmb(self.dim)(t)
        emb = Dense(ted, name="time_embed_1")(emb)
        emb = Dense(ted, name="time_embed_2")(jax.nn.silu(emb))

        if self.num_classes is not None and y is not None:
            # row num_classes is the zero-init null class (== reference y=None)
            table = nn.Embed(
                self.num_classes + 1,
                ted,
                embedding_init=_null_padded_normal,
                name="class_embed",
            )
            emb = emb + table(jnp.asarray(y, jnp.int32))

        def attn(dim: int, name: str):
            return SelfAttentionBlock(dim, dim // self.attn_head_dims, name=name)

        h = Conv(self.dim, 3, 1, 1, name="first_conv")(x)
        skips = [h]

        for i in range(n_stages):
            out_dim = self.dim * self.dim_mults[i]
            for j in range(self.num_res_blocks):
                h = ResBlockAdaGN(out_dim, self.dropout, name=f"down_{i}_res_{j}")(h, emb, train=train)
                if self.use_attn[i]:
                    h = attn(out_dim, f"down_{i}_attn_{j}")(h)
                skips.append(h)
            if i < n_stages - 1:
                if self.resblock_updown:
                    h = ResBlockAdaGN(out_dim, self.dropout, down=True, name=f"down_{i}_downsample")(h, emb, train=train)
                else:
                    h = Downsample(out_dim, name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = ResBlockAdaGN(h.shape[-1], self.dropout, name="mid_res_1")(h, emb, train=train)
        h = SelfAttentionBlock(h.shape[-1], 1, name="mid_attn")(h)
        h = ResBlockAdaGN(h.shape[-1], self.dropout, name="mid_res_2")(h, emb, train=train)

        for i in range(n_stages - 1, -1, -1):
            out_dim = self.dim * self.dim_mults[i]
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlockAdaGN(out_dim, self.dropout, name=f"up_{i}_res_{j}")(h, emb, train=train)
                if self.use_attn[i]:
                    h = attn(out_dim, f"up_{i}_attn_{j}")(h)
            if i > 0:
                if self.resblock_updown:
                    h = ResBlockAdaGN(out_dim, self.dropout, up=True, name=f"up_{i}_upsample")(h, emb, train=train)
                else:
                    h = Upsample(out_dim, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="last_norm")(h)
        h = Conv(self.out_channels, 3, 1, 1, name="last_conv")(jax.nn.silu(h))
        return h


def _null_padded_normal(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default init (N(0,1)) with a zeroed final null row."""
    table = jax.random.normal(key, shape, dtype)
    return table.at[-1].set(0.0)
