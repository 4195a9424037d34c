"""CLIP guidance: steer sampling toward a text prompt.

The reference backprops through HF CLIP on the predicted x0 each step
(reference: diffusions/guidance/clip_guidance.py:38-50), re-preprocessing
uint8 images on host per step.  TPU-native version: the whole
similarity-gradient is inside the compiled loop — in-graph preprocessing +
FlaxCLIP forward, with the text embedding precomputed once.  Matching the
reference, the gradient is taken w.r.t. the preprocessed ``pixel_values``
and spatially resized back; the delta on the posterior mean is
``w * sqrt(1/ᾱt) * var * resize(dL/d(pixel_values))``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddpm import Array
from dmtpu.diffusions.guidance.base import BaseGuidance

# OpenAI CLIP preprocessing constants
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPGuidance(BaseGuidance):
    def __init__(
        self,
        guidance_weight: float = 1.0,
        clip_pretrained: str = "openai/clip-vit-base-patch32",
        text_features_fn: Any = None,
        image_features_fn: Any = None,
        tokenizer: Any = None,
        image_size: int = 224,
        **kwargs: Any,
    ):
        """Either pass ready feature callables
        (``text_features_fn(input_ids, attention_mask) -> [B, D]``,
        ``image_features_fn(pixel_values_nchw) -> [B, D]``) plus a tokenizer,
        or a local ``clip_pretrained`` path loadable by HF transformers
        (zero-egress environments must point at a local checkout)."""
        super().__init__(**kwargs)
        self.guidance_weight = float(guidance_weight)
        self.image_size = int(image_size)
        if text_features_fn is None or image_features_fn is None:
            from transformers import CLIPTokenizer, FlaxCLIPModel

            model = FlaxCLIPModel.from_pretrained(clip_pretrained)
            # feature extraction lives on the MODEL wrapper (the bare Flax
            # module has no get_*_features methods)
            text_features_fn = lambda ids, mask: model.get_text_features(  # noqa: E731
                input_ids=ids, attention_mask=mask)
            image_features_fn = lambda px: model.get_image_features(pixel_values=px)  # noqa: E731
            tokenizer = CLIPTokenizer.from_pretrained(clip_pretrained)
        self._text_features = text_features_fn
        self._image_features_raw = image_features_fn
        self.tokenizer = tokenizer
        self.text_embed: Optional[Array] = None

    def set_text(self, text: str):
        """Precompute the (normalised) text embedding once."""
        tokens = self.tokenizer([text], return_tensors="np", padding=True)
        feats = self._text_features(jnp.asarray(tokens["input_ids"]),
                                    jnp.asarray(tokens["attention_mask"]))
        self.text_embed = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def set_text_embed(self, text_embed: Array):
        self.text_embed = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)

    def _preprocess(self, x0: Array) -> Array:
        """CLIP preprocessing in-graph: [-1,1] NHWC -> normalised NCHW
        pixel_values (the reference round-trips through uint8 on host;
        quantisation is non-differentiable and is dropped here)."""
        img = (x0 + 1.0) / 2.0
        b, h, w, c = img.shape
        img = jax.image.resize(img, (b, self.image_size, self.image_size, c), "bilinear")
        img = (img - _CLIP_MEAN) / _CLIP_STD
        return jnp.transpose(img, (0, 3, 1, 2))

    def cond_fn_mean(self, out, xt, c, rng):
        if self.text_embed is None:
            raise RuntimeError("Please call `set_text()` before sampling.")
        # Gradient w.r.t. the preprocessed pixel_values, then spatially
        # resized to the sample — NOT w.r.t. pred_x0 through the
        # preprocessing chain, whose adjoint would rescale the delta by
        # ~0.5/std per channel and change tuned guidance_weight behaviour
        # (reference: diffusions/guidance/clip_guidance.py:42-50).
        pixel_values = self._preprocess(out["pred_x0"])

        def similarity(px):
            feats = self._image_features_raw(px)
            # reference similarity uses CLIPModel's NORMALISED image_embeds
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            return jnp.sum(feats @ self.text_embed.T)

        grad_px = jax.grad(similarity)(pixel_values)       # [B, C, 224, 224]
        grad = jnp.transpose(grad_px, (0, 2, 3, 1))
        b, h, w, c_ = xt.shape
        grad = jax.image.resize(grad, (b, h, w, c_), "bilinear")  # antialiased
        return self.guidance_weight * c["sqrt_recip_ac"] * out["var"] * grad
