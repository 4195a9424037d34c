"""Latent-space wrapper for DiT / MDT (VAE + ViT composition).

Parity with reference: models/dit/dit.py:10-33 and models/mdt/mdt.py:10-33:
``decode_latent(z) = vae.decode(z / scale_factor)``; the denoiser forward is
the wrapped ViT.  The reference pulls its VAE from diffusers
(``stabilityai/sd-vae-ft-ema``); here ``PretrainedVAE`` records the path and
builds the same CompVis AutoencoderKL architecture — weights are converted
with ``dmtpu.convert.sd.diffusers_vae_to_compvis`` when loaded.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dmtpu.models.stablediffusion import AutoencoderKL

Array = jax.Array


def PretrainedVAE(from_pretrained: Optional[str] = None, **kwargs: Any) -> AutoencoderKL:
    """The diffusers sd-vae-ft-ema/mse architecture == SD's AutoencoderKL."""
    vae = AutoencoderKL(**kwargs)
    # record for script-side weight loading (zero-egress: must be local)
    object.__setattr__(vae, "_from_pretrained", from_pretrained)
    return vae


class LatentDiffusionWrapper:
    """VAE + ViT latent diffusion model (DiT / MDT)."""

    def __init__(
        self,
        vae_config: Optional[Dict] = None,
        vit_config: Optional[Dict] = None,
        scale_factor: float = 0.18215,
        **_: Any,
    ):
        from dmtpu.utils.config import instantiate_from_config

        self.scale_factor = float(scale_factor)
        self.vae: AutoencoderKL = (
            instantiate_from_config(vae_config) if vae_config else PretrainedVAE()
        )
        self.vit = instantiate_from_config(vit_config) if vit_config else None
        self.params: Optional[Dict] = None  # {"vit", "vae"}

    def load_state_dict(self, state_dict: Dict, vae_sd: Optional[Dict] = None):
        """ViT weights from the upstream checkpoint; VAE weights separate."""
        from dmtpu.convert.sd import diffusers_vae_to_compvis
        from dmtpu.convert.common import convert_by_structure
        from dmtpu.convert.zoo import convert_dit, convert_mdt

        vit_init = jax.eval_shape(
            self.vit.init, jax.random.PRNGKey(0),
            jnp.zeros((1, self.vit.input_size, self.vit.input_size, self.vit.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )
        conv = convert_mdt if type(self.vit).__name__ == "MDTv2" else convert_dit
        vit_params = conv(state_dict, vit_init)
        vae_params = None
        if vae_sd is not None:
            if any(k.startswith("encoder.down_blocks") for k in vae_sd):
                vae_sd = diffusers_vae_to_compvis(vae_sd)
            vae_init = jax.eval_shape(
                self.vae.init, jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, self.vae.in_channels)), jnp.zeros((2,), jnp.uint32),
            )
            vae_params = convert_by_structure(vae_sd, vae_init)
        self.params = {"vit": vit_params, "vae": vae_params}
        return self.params

    def decode_latent(self, params: Dict, z: Array) -> Array:
        return self.vae.apply(params["vae"], z / self.scale_factor, method=self.vae.decode)

    def vit_forward(self, params: Dict, x: Array, t: Array, y: Optional[Array] = None) -> Array:
        return self.vit.apply(params["vit"], x, t, y)

    def make_model_fn(self, params: Dict):
        def model_fn(x, t, y=None, **kw):
            return self.vit_forward(params, x, t, y)

        return model_fn
