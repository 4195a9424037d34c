"""Shared Flax building blocks for the trainable UNets.

NHWC re-design of the reference blocks (reference: models/modules.py):
  - SinusoidalPosEmb       (:40-57)
  - Upsample / Downsample  (:60-74)
  - SelfAttentionBlock     (:77-102) — flattened spatial tokens through
    ``dmtpu.ops.attention`` (f32 softmax, flash path for long sequences)
  - AdaGN                  (:105-123)

Initialisers reproduce PyTorch layer defaults (kaiming-uniform weights with
a=sqrt(5); uniform fan-in bias) so freshly-initialised training runs match
the reference's statistics.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmtpu.ops.attention import flash_mha
from dmtpu.ops.groupnorm import group_norm_silu

Array = jax.Array

# torch nn.Linear/nn.Conv2d default weight init (kaiming_uniform, a=sqrt(5))
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """nn.Conv with torch-default init (NHWC)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size * self.kernel_size
        pad = self.padding if isinstance(self.padding, str) else [(self.padding, self.padding)] * 2
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Dense(nn.Module):
    """nn.Dense with torch-default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class SinusoidalPosEmb(nn.Module):
    """Transformer sinusoidal timestep embedding.  (reference: models/modules.py:40-57)"""

    dim: int

    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        freqs = np.exp(-math.log(10000) / (half - 1) * np.arange(half, dtype=np.float64))
        emb = jnp.asarray(t, jnp.float32)[:, None] * jnp.asarray(freqs, jnp.float32)[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class Upsample(nn.Module):
    """2x nearest upsample, optional 3x3 conv.  (reference: models/modules.py:60-66)"""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        if self.use_conv:
            x = Conv(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv, or 2x2 avg-pool.  (reference: models/modules.py:69-74)"""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_conv:
            return Conv(self.out_channels, 3, 2, 1, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class SelfAttentionBlock(nn.Module):
    """GroupNorm -> qkv -> MHA over spatial tokens -> proj, residual.

    (reference: models/modules.py:77-102; the reference's 1x1-conv q/k/v
    become dense projections over flattened [B, H*W, C] tokens — the same
    math, MXU-shaped.)
    """

    dim: int
    n_heads: int = 1
    groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        assert c % self.n_heads == 0
        hd = c // self.n_heads
        xn = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32,
                          name="norm")(x.astype(jnp.float32)).astype(x.dtype)
        tokens = xn.reshape(b, h * w, c)
        q = Dense(c, dtype=self.dtype, name="q")(tokens).reshape(b, h * w, self.n_heads, hd)
        k = Dense(c, dtype=self.dtype, name="k")(tokens).reshape(b, h * w, self.n_heads, hd)
        v = Dense(c, dtype=self.dtype, name="v")(tokens).reshape(b, h * w, self.n_heads, hd)
        out = flash_mha(q, k, v)  # scale = hd**-0.5, matching reference; f32 softmax
        # "attn" selective-remat tag (see stablediffusion/attention.py)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_out")
        out = Dense(c, dtype=self.dtype, name="proj")(out.reshape(b, h * w, c))
        return out.reshape(b, h, w, c) + x


class AdaGN(nn.Module):
    """Adaptive GroupNorm: ``gn(x) * (1 + ys) + yb`` from an embedding.

    (reference: models/modules.py:105-123)
    """

    num_groups: int
    num_channels: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: Array, embed: Array) -> Array:
        y = Dense(self.num_channels * 2, name="proj")(jax.nn.silu(embed))
        ys, yb = jnp.split(y, 2, axis=-1)
        ys = ys[:, None, None, :]
        yb = yb[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="gn")(x)
        return h * (1.0 + ys) + yb


class FusedGNSiLU(nn.Module):
    """GroupNorm(+SiLU) through the Pallas fused kernel (param-compatible
    with ``nn.GroupNorm``: leaves are ``scale``/``bias``)."""

    groups: int = 32
    silu: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_silu(x, scale, bias, self.groups, self.eps, self.silu)
