"""pesser/pytorch_diffusion DDPM UNet (CelebA-HQ / LSUN 256 pretrained), in Flax/NHWC.

Architecture parity with reference: models/pesser/model.py:190-327 (Ho et al.
TF UNet port): eps-1e-6 GroupNorm, swish, asymmetrically-padded stride-2
downsampling, single-head 1x1-conv attention at chosen resolutions.

Flax submodule names mirror the torch module paths (``.`` → ``__``) so the
checkpoint converter (``dmtpu.convert``) is purely mechanical.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.modules import SinusoidalPosEmb
from dmtpu.ops.attention import mha

Array = jax.Array


def _norm(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class _ResnetBlock(nn.Module):
    """(reference: models/pesser/model.py:76-133)"""

    out_channels: int
    dropout: float = 0.0
    conv_shortcut: bool = False

    @nn.compact
    def __call__(self, x: Array, temb: Array, *, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        h = _norm("norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = h + nn.Dense(self.out_channels, name="temb_proj")(jax.nn.silu(temb))[:, None, None, :]
        h = _norm("norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            if self.conv_shortcut:
                x = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_shortcut")(x)
            else:
                x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class _AttnBlock(nn.Module):
    """Single-head attention with 1x1-conv projections.

    (reference: models/pesser/model.py:136-187)
    """

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hn = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(b, h * w, 1, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(b, h * w, 1, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(b, h * w, 1, c)
        out = mha(q, k, v, scale=c ** -0.5).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name="proj_out")(out)
        return x + out


class _Downsample(nn.Module):
    """Asymmetric (0,1,0,1) pad + stride-2 conv.  (reference: models/pesser/model.py:55-72)"""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        if self.with_conv:
            return nn.Conv(c, (3, 3), strides=2, padding=((0, 1), (0, 1)), name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _Upsample(nn.Module):
    """(reference: models/pesser/model.py:38-52)"""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding=1, name="conv")(x)
        return x


class PesserUNet(nn.Module):
    """(reference: models/pesser/model.py:190-327)"""

    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True

    @nn.compact
    def __call__(self, x: Array, t: Array, *, train: bool = False) -> Array:
        assert x.shape[1] == x.shape[2] == self.resolution
        nres = len(self.ch_mult)
        temb_ch = self.ch * 4

        temb = SinusoidalPosEmb(self.ch)(jnp.asarray(t, jnp.float32))
        temb = nn.Dense(temb_ch, name="temb__dense__0")(temb)
        temb = nn.Dense(temb_ch, name="temb__dense__1")(jax.nn.silu(temb))

        in_ch_mult = (1,) + tuple(self.ch_mult)
        curr_res = self.resolution

        hs = [nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)]
        for i in range(nres):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                h = _ResnetBlock(block_out, self.dropout, name=f"down__{i}__block__{j}")(hs[-1], temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = _AttnBlock(name=f"down__{i}__attn__{j}")(h)
                hs.append(h)
            if i != nres - 1:
                hs.append(_Downsample(self.resamp_with_conv, name=f"down__{i}__downsample")(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        h = _ResnetBlock(h.shape[-1], self.dropout, name="mid__block_1")(h, temb, train=train)
        h = _AttnBlock(name="mid__attn_1")(h)
        h = _ResnetBlock(h.shape[-1], self.dropout, name="mid__block_2")(h, temb, train=train)

        for i in reversed(range(nres)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = _ResnetBlock(block_out, self.dropout, name=f"up__{i}__block__{j}")(h, temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = _AttnBlock(name=f"up__{i}__attn__{j}")(h)
            if i != 0:
                h = _Upsample(self.resamp_with_conv, name=f"up__{i}__upsample")(h)
                curr_res *= 2

        h = _norm("norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
        return h
