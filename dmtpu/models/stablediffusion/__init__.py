"""Stable Diffusion 1.5 / 2.1 latent text-to-image stack.

``StableDiffusion`` composes the CLIP text encoder + AutoencoderKL + cross-
attention UNet (reference: models/stablediffusion/stablediffusion.py:12-79)
as a functional wrapper: modules are Flax, parameters live in one dict
``{"unet":…, "vae":…, "text_encoder":…}`` produced by
``dmtpu.convert.sd.convert_sd_checkpoint`` from the original CompVis .ckpt /
.safetensors (the reference's ``first_stage_model.`` /
``model.diffusion_model.`` key surgery, :73-79).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from dmtpu.models.stablediffusion.attention import SpatialTransformer
from dmtpu.models.stablediffusion.autoencoder import (
    AutoencoderKL,
    Decoder,
    DiagonalGaussianDistribution,
    Encoder,
)
from dmtpu.models.stablediffusion.text_encoders import (
    CLIPTextTransformer,
    FrozenCLIPEmbedder,
    FrozenCLIPT5Encoder,
    FrozenOpenCLIPEmbedder,
    FrozenT5Embedder,
)
from dmtpu.models.stablediffusion.unet import SDUNetModel

Array = jax.Array

__all__ = [
    "StableDiffusion",
    "SDUNetModel",
    "AutoencoderKL",
    "Encoder",
    "Decoder",
    "DiagonalGaussianDistribution",
    "SpatialTransformer",
    "CLIPTextTransformer",
    "FrozenCLIPEmbedder",
    "FrozenOpenCLIPEmbedder",
    "FrozenT5Embedder",
    "FrozenCLIPT5Encoder",
]


class StableDiffusion:
    """Functional SD wrapper instantiable from the reference weight YAMLs."""

    def __init__(
        self,
        text_encoder_config: Optional[Dict] = None,
        vae_config: Optional[Dict] = None,
        unet_config: Optional[Dict] = None,
        scale_factor: float = 0.18215,
        low_vram_shift_enabled: bool = False,  # accepted for config parity
        **_: Any,
    ):
        from dmtpu.utils.config import instantiate_from_config

        self.scale_factor = float(scale_factor)
        self.text_encoder = (
            instantiate_from_config(text_encoder_config) if text_encoder_config else FrozenCLIPEmbedder()
        )
        self.vae: AutoencoderKL = (
            instantiate_from_config(vae_config) if vae_config else AutoencoderKL()
        )
        self.unet: SDUNetModel = (
            instantiate_from_config(unet_config) if unet_config else None
        )
        self.params: Optional[Dict] = None  # {"unet","vae","text_encoder"}

    # --- loading -------------------------------------------------------
    def load_state_dict(self, state_dict: Dict, text_encoder_sd: Optional[Dict] = None):
        """Convert a CompVis-format checkpoint (numpy values) into params."""
        from dmtpu.convert.sd import convert_sd_checkpoint

        self.params = convert_sd_checkpoint(self, state_dict, text_encoder_sd)
        return self.params

    def load_weights(self, path: str) -> Dict:
        """Load SD params from any supported artifact: a CompVis-format
        torch ``.ckpt``/``.safetensors`` (converted on the fly), or a
        ``.npz`` holding the already-converted flax tree under ``params``
        (what ``scripts/merge_lora.py`` writes after merging adapters —
        reference: utils/load.py:7-19 for the torch dispatcher side)."""
        if path.endswith(".npz"):
            import numpy as np

            self.params = np.load(path, allow_pickle=True)["params"].item()
            return self.params
        from dmtpu.convert import load_torch_weights

        return self.load_state_dict(load_torch_weights(path))

    def init_params(self, rng: Array, img_size: int = 64) -> Dict:
        """Random-init params in the same ``{"unet","vae","text_encoder"}``
        layout ``load_state_dict`` produces — a checkpoint-free path for
        demos and tests (the UIs fall back to this when no weights env var
        is set).  Only CLIP-family text encoders (which own a Flax
        ``model``) are supported; T5-based encoders load externally."""
        if not hasattr(self.text_encoder, "model"):
            raise ValueError("init_params supports CLIP-family text encoders only")
        k_unet, k_vae, k_text = jax.random.split(rng, 3)
        lat = img_size // 8
        ctx_dim = self.unet.context_dim
        max_len = getattr(self.text_encoder, "max_length", 77)
        unet_p = self.unet.init(
            k_unet, jnp.zeros((1, lat, lat, self.unet.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, max_len, ctx_dim)))
        vae_p = self.vae.init(k_vae, jnp.zeros((1, img_size, img_size, 3)),
                              rng=jax.random.PRNGKey(0))
        text_p = self.text_encoder.model.init(
            k_text, jnp.ones((1, max_len), jnp.int32))
        self.params = {"unet": unet_p, "vae": vae_p, "text_encoder": text_p}
        return self.params

    _UNSET = object()

    def set_tome(self, ratio: float, sx=_UNSET, sy=_UNSET,
                 max_downsample=_UNSET, seed=_UNSET):
        """Enable (ratio>0) / disable (0) Token Merging on the UNet.

        Serving-only acceleration (dmtpu/ops/tome.py): rebinds the UNet
        module with ToMe fields — NO parameters change, so already-loaded
        ``self.params`` keep working.  Knobs left unspecified KEEP their
        current value (``set_tome(0.6)`` after ``set_tome(0.5, seed=3)``
        only changes the ratio).  Returns self for chaining."""
        u = self.unet
        self.unet = u.clone(
            tome_ratio=float(ratio),
            tome_sx=u.tome_sx if sx is self._UNSET else int(sx),
            tome_sy=u.tome_sy if sy is self._UNSET else int(sy),
            tome_max_downsample=(u.tome_max_downsample
                                 if max_downsample is self._UNSET
                                 else int(max_downsample)),
            tome_seed=u.tome_seed if seed is self._UNSET else seed)
        return self

    def set_freeu(self, scales=None):
        """Enable FreeU (``scales=(b1, b2, s1, s2)``, e.g.
        ``dmtpu.ops.freeu.SD15_DEFAULTS``) or disable it (``None``).
        Serving-only quality knob; params unchanged.  Returns self."""
        if scales is not None:
            scales = tuple(float(s) for s in scales)
            if len(scales) != 4:
                raise ValueError(
                    f"FreeU needs exactly (b1, b2, s1, s2), got {len(scales)}")
        self.unet = self.unet.clone(freeu=scales)
        return self

    # --- functional pieces (explicit params for jit closures) ----------
    def unet_forward(self, params: Dict, x: Array, timesteps: Array, context: Array) -> Array:
        return self.unet.apply(params["unet"], x, timesteps, context=context)

    def decode_latent(self, params: Dict, z: Array) -> Array:
        z = z / self.scale_factor
        return self.vae.apply(params["vae"], z, method=self.vae.decode)

    def encode_latent(self, params: Dict, x: Array, rng: Array) -> Array:
        moments = self.vae.apply(params["vae"], x, method=self.vae.encode_moments)
        z = DiagonalGaussianDistribution(moments).sample(rng)
        return self.scale_factor * z

    def text_encoder_encode_tokens(self, params: Dict, input_ids: Array) -> Array:
        return self.text_encoder.encode_tokens(params["text_encoder"], input_ids)

    def text_encoder_encode(self, params: Dict, text: List[str]) -> Array:
        ids = jnp.asarray(self.text_encoder.tokenize(text))
        return self.text_encoder_encode_tokens(params, ids)

    # --- model_fn seam for the samplers --------------------------------
    def __call__(self, x: Array, timesteps: Array, text_embed: Array = None, params=None) -> Array:
        assert params is not None and text_embed is not None
        return self.unet_forward(params, x, timesteps, text_embed)

    def make_model_fn(self, params: Dict):
        """model_fn(x, t, text_embed=...) for DDIM/DDPM samplers."""

        def model_fn(x, t, text_embed=None, **kw):
            return self.unet_forward(params, x, t, text_embed)

        return model_fn
