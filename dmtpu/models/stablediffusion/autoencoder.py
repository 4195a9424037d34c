"""Stable Diffusion AutoencoderKL (CompVis first-stage VAE), in Flax/NHWC.

Architecture parity with reference: models/stablediffusion/autoencoder.py
(Encoder :280-375, Decoder :377-487, AutoEncoderKL :486-537,
DiagonalGaussianDistribution in distributions.py:24-61).  The building blocks
are the pesser/CompVis ones (eps-1e-6 GroupNorm, swish, asymmetric stride-2
pad), reused from ``dmtpu.models.pesser``.

This same class serves the DiT/MDT latent wrappers (the diffusers
sd-vae-ft-ema/mse VAEs share this architecture; use
``dmtpu.convert.sd.diffusers_vae_to_compvis`` for their key layout).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.pesser import _AttnBlock, _Downsample, _ResnetBlock, _Upsample, _norm

Array = jax.Array


class _VAEResnetBlock(nn.Module):
    """ResnetBlock with temb_channels=0 (no temb_proj params)."""

    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        h = _norm("norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = _norm("norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class Encoder(nn.Module):
    """(reference: models/stablediffusion/autoencoder.py:280-375)"""

    ch: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    double_z: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nres = len(self.ch_mult)
        curr_res = self.resolution
        hs = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        for i in range(nres):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                hs = _VAEResnetBlock(block_out, self.dropout, name=f"down__{i}__block__{j}")(hs)
                if curr_res in self.attn_resolutions:
                    hs = _AttnBlock(name=f"down__{i}__attn__{j}")(hs)
            if i != nres - 1:
                hs = _Downsample(True, name=f"down__{i}__downsample")(hs)
                curr_res //= 2

        h = _VAEResnetBlock(hs.shape[-1], self.dropout, name="mid__block_1")(hs)
        h = _AttnBlock(name="mid__attn_1")(h)
        h = _VAEResnetBlock(h.shape[-1], self.dropout, name="mid__block_2")(h)

        h = _norm("norm_out")(h)
        h = jax.nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    """(reference: models/stablediffusion/autoencoder.py:377-487)"""

    ch: int
    out_ch: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    tanh_out: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, z: Array) -> Array:
        nres = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (nres - 1)

        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)
        h = _VAEResnetBlock(block_in, self.dropout, name="mid__block_1")(h)
        h = _AttnBlock(name="mid__attn_1")(h)
        h = _VAEResnetBlock(block_in, self.dropout, name="mid__block_2")(h)

        for i in reversed(range(nres)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = _VAEResnetBlock(block_out, self.dropout, name=f"up__{i}__block__{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = _AttnBlock(name=f"up__{i}__attn__{j}")(h)
            if i != 0:
                h = _Upsample(True, name=f"up__{i}__upsample")(h)
                curr_res *= 2

        h = _norm("norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


class DiagonalGaussianDistribution:
    """(reference: models/stablediffusion/distributions.py:24-61); NHWC moments."""

    def __init__(self, moments: Array, deterministic: bool = False):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: Array) -> Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> Array:
        if self.deterministic:
            return jnp.zeros(())
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar, axis=(1, 2, 3))
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=(1, 2, 3),
        )


class AutoencoderKL(nn.Module):
    """(reference: models/stablediffusion/autoencoder.py:486-537)"""

    embed_dim: int = 4
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    # accepted for config parity (vanilla-xformers == vanilla numerically)
    double_z: bool = True
    attn_type: str = "vanilla"

    def setup(self):
        self.encoder = Encoder(ch=self.ch, z_channels=self.z_channels, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               attn_resolutions=self.attn_resolutions,
                               resolution=self.resolution, dropout=self.dropout)
        self.decoder = Decoder(ch=self.ch, out_ch=self.out_ch, z_channels=self.z_channels,
                               ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
                               attn_resolutions=self.attn_resolutions,
                               resolution=self.resolution, dropout=self.dropout)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1))

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussianDistribution(moments)

    def encode_moments(self, x: Array) -> Array:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array, rng: Optional[Array] = None,
                 sample_posterior: bool = True) -> Tuple[Array, Array]:
        moments = self.encode_moments(x)
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), moments
