"""ILVR: low-pass-filter reference injection.

Per-step: add φ(noisy_ref) − φ(sample) to the sampled x_{t-1}, where φ is the
ResizeRight down/up round trip (reference: diffusions/guidance/ilvr.py:37-52).
The low-pass filter here is our matmul-form ResizeRight
(``dmtpu.ops.resize_right``), whose weights are jit-time constants — the
whole guided loop stays one compiled scan.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dmtpu.diffusions.ddpm import Array
from dmtpu.diffusions.guidance.base import BaseGuidance
from dmtpu.ops.resize_right import resize


class ILVR(BaseGuidance):
    def __init__(
        self,
        ref_images: Optional[Array] = None,
        downsample_factor: int = 8,
        interp_method: str = "cubic",
        *args: Any,
        **kwargs: Any,
    ):
        super().__init__(*args, **kwargs)
        self.ref_images = ref_images
        self.downsample_factor = int(downsample_factor)
        self.interp_method = interp_method

    def set_ref_images(self, ref_images: Array):
        self.ref_images = ref_images

    def low_pass_filter(self, x: Array) -> Array:
        """(reference: diffusions/guidance/ilvr.py:49-52)"""
        x = resize(x, scale_factors=1.0 / self.downsample_factor, interp_method=self.interp_method)
        x = resize(x, scale_factors=float(self.downsample_factor), interp_method=self.interp_method)
        return x

    def cond_fn_sample(self, out, xt, c, rng):
        if self.ref_images is None:
            raise RuntimeError("Please call `set_ref_images()` before sampling.")
        ref = jnp.asarray(self.ref_images, jnp.float32)
        eps = jax.random.normal(rng, ref.shape, jnp.float32)
        diffused = c["sqrt_ac_prev"] * ref + c["sqrt_1m_ac_prev"] * eps
        noisy_ref = c["nonzero"] * diffused + (1.0 - c["nonzero"]) * ref
        return self.low_pass_filter(noisy_ref) - self.low_pass_filter(out["sample"])
