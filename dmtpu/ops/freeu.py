"""FreeU — training-free diffusion-UNet re-weighting (serving quality knob).

Si et al., "FreeU: Free Lunch in Diffusion U-Net" (CVPR 2024): at the two
deepest decoder stages, amplify the backbone half of the channels (the
denoising "structure" path) and damp the low-frequency band of the skip
connection (which otherwise re-injects noise the backbone already removed).
Four scalars (b1, b2, s1, s2); no parameters, no retraining — a pure
serving-time quality improvement that composes with every sampler.

TPU notes: the spectral filter is two small batched FFTs per gated skip —
XLA lowers ``jnp.fft`` natively; the mask is a static centered box
(threshold=1 → the 2x2 lowest-frequency bins), so everything stays
static-shape inside the jitted sampling scan.  Computed in f32 (FFT of bf16
inputs upcasts; output is cast back).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# Recommended settings from the paper (backbone b1/b2, skip s1/s2)
SD15_DEFAULTS = (1.5, 1.6, 0.9, 0.2)
SD21_DEFAULTS = (1.4, 1.6, 0.9, 0.2)
SDXL_DEFAULTS = (1.3, 1.4, 0.9, 0.2)


def fourier_filter(x: Array, threshold: int, scale: float) -> Array:
    """Scale the centered low-frequency box of an NHWC feature map.

    FFT over (H, W), shift DC to the center, multiply the
    ``2*threshold x 2*threshold`` center box by ``scale``, invert.  The
    official FreeU filter in NHWC."""
    dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    _, h, w, _ = x.shape
    ch, cw = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[:, ch - threshold:ch + threshold,
                   cw - threshold:cw + threshold, :].set(scale)
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(dtype)


def apply_freeu(h: Array, skip: Array, model_channels: int,
                b1: float, b2: float, s1: float, s2: float):
    """FreeU gate at one decoder concat site (NHWC).

    Stage 1 (deepest, backbone channels == 4*model_channels): scale the
    first half of the backbone channels by ``b1`` and Fourier-damp the skip
    by ``s1``; stage 2 (2*model_channels): ``b2``/``s2``.  Other sites pass
    through unchanged.  Returns ``(h, skip)``."""
    c = h.shape[-1]
    if c == model_channels * 4:
        half = model_channels * 2
        h = jnp.concatenate([h[..., :half] * b1, h[..., half:]], axis=-1)
        skip = fourier_filter(skip, 1, s1)
    elif c == model_channels * 2:
        half = model_channels
        h = jnp.concatenate([h[..., :half] * b2, h[..., half:]], axis=-1)
        skip = fourier_filter(skip, 1, s2)
    return h, skip
