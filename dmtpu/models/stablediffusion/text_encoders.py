"""CLIP text encoders for SD conditioning, in Flax.

Replaces reference: models/stablediffusion/text_encoders.py:
  - FrozenCLIPEmbedder (:57-101)  — HF CLIP ViT-L text tower (SD1.5)
  - FrozenOpenCLIPEmbedder (:104-165) — open_clip ViT-H/bigG text tower
    (SD2.1 / SDXL), penultimate-layer output
  - FrozenT5Embedder / FrozenCLIPT5Encoder — optional, via HF Flax T5

One self-contained ``CLIPTextTransformer`` covers all CLIP variants; module
names follow the HF ``CLIPTextModel`` torch layout (minus the ``text_model.``
prefix) so HF checkpoints convert mechanically, and
``dmtpu.convert.sd.openclip_text_to_hf`` rewrites open_clip state_dicts
(fused in_proj → q/k/v) into the same layout.

Tokenisation is host-side (transformers CLIPTokenizer from a LOCAL path in
zero-egress environments); encoders consume token ids.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        b, t, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        logits = logits * (hd ** -0.5) + causal_mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class _CLIPLayer(nn.Module):
    heads: int
    act: str = "quick_gelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + _CLIPAttention(self.heads, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp__fc1")(h)
        h = quick_gelu(h) if self.act == "quick_gelu" else jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, dtype=self.dtype, name="mlp__fc2")(h)
        return x


class CLIPTextTransformer(nn.Module):
    """Causal CLIP text tower.

    ``output_layer``: 'last' (after all blocks; final LN applied),
    'penultimate' (skip last block; final LN applied — SD2.x legacy
    open_clip semantics), 'penultimate-nonorm' (skip last block, NO final
    LN — SDXL's FrozenOpenCLIPEmbedder2 with legacy=False returns the raw
    penultimate hidden; ln_final is only applied on the LAST hidden for the
    pooled vector, reference: models/sdxl/conditioner.py:307-331),
    or a negative int (HF hidden_states index; NO final LN, matching
    ``output_hidden_states`` semantics of FrozenCLIPEmbedder layer='hidden').
    """

    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    act: str = "quick_gelu"
    projection_dim: Optional[int] = None  # open_clip text_projection (pooled)
    dtype: Any = None

    @nn.compact
    def __call__(self, input_ids: Array,
                 output_layer: Union[str, int] = "last",
                 return_pooled: bool = False):
        b, t = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width,
                       name="embeddings__token_embedding")(jnp.asarray(input_ids, jnp.int32))
        pos = nn.Embed(self.max_length, self.width,
                       name="embeddings__position_embedding")(jnp.arange(t, dtype=jnp.int32))
        x = tok + pos[None]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]

        # hiddens mirrors HF hidden_states: [embeddings, after layer 1, ...]
        if output_layer == "last":
            sel, final_ln = -1, True
        elif output_layer == "penultimate":
            sel, final_ln = -2, True
        elif output_layer == "penultimate-nonorm":
            sel, final_ln = -2, False
        else:
            if output_layer is None:
                raise ValueError(
                    "output_layer is None — a config using layer='hidden' "
                    "must also set layer_idx")
            sel, final_ln = int(output_layer), False  # HF hidden_states[idx], no final LN

        # run every layer (registers all params; XLA dead-code-eliminates the
        # unused tail) and select the wanted hidden state statically
        hiddens = [x]
        h = x
        for i in range(self.layers):
            h = _CLIPLayer(self.heads, self.act, dtype=self.dtype,
                           name=f"encoder__layers__{i}")(h, mask)
            hiddens.append(h)
        hidden = hiddens[sel]
        # ONE final-LN module instance, applied where needed (shared params)
        final_norm = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")
        zl_last = final_norm(hiddens[-1])  # always registers params
        z = final_norm(hidden) if final_ln else hidden
        if sel == -1 and final_ln:
            z = zl_last
        if not return_pooled:
            return z
        # pooled = final-LN of the LAST hidden at the EOT (argmax) token,
        # optionally through text_projection (open_clip/bigG semantics)
        zl = zl_last
        eot = jnp.argmax(jnp.asarray(input_ids, jnp.int32), axis=-1)
        pooled = zl[jnp.arange(b), eot]
        if self.projection_dim is not None:
            proj = self.param("text_projection", nn.initializers.normal(0.02),
                              (self.width, self.projection_dim))
            pooled = pooled @ proj
        return z, pooled


# preset configurations
CLIP_TEXT_CONFIGS = {
    # HF openai/clip-vit-large-patch14 (SD1.5)
    "clip-vit-l": dict(width=768, layers=12, heads=12, act="quick_gelu"),
    # open_clip ViT-H-14 (SD2.x)
    "open-clip-vit-h": dict(width=1024, layers=24, heads=16, act="gelu"),
    # open_clip ViT-bigG-14 (SDXL)
    "open-clip-vit-bigg": dict(width=1280, layers=32, heads=20, act="gelu", projection_dim=1280),
}


class FrozenCLIPEmbedder:
    """SD1.5 text conditioning (functional wrapper over CLIPTextTransformer).

    (reference: models/stablediffusion/text_encoders.py:57-101)
    """

    def __init__(self, version: str = "clip-vit-l", max_length: int = 77,
                 layer: str = "last", layer_idx: Optional[int] = None,
                 tokenizer: Any = None,
                 config_overrides: Optional[dict] = None, **_: Any):
        cfg = dict(CLIP_TEXT_CONFIGS.get(version, CLIP_TEXT_CONFIGS["clip-vit-l"]))
        cfg.update(config_overrides or {})  # tiny towers for tests/demo configs
        self.model = CLIPTextTransformer(max_length=max_length, **cfg)
        self.layer = layer
        self.layer_idx = layer_idx
        self.max_length = max_length
        self.tokenizer = tokenizer
        self.params = None

    def output_layer(self) -> Union[str, int]:
        if self.layer == "hidden":
            return self.layer_idx
        return "last"

    def encode_tokens(self, params, input_ids: Array) -> Array:
        return self.model.apply(params, input_ids, output_layer=self.output_layer())

    def tokenize(self, texts) -> np.ndarray:
        assert self.tokenizer is not None, "provide a tokenizer (local CLIPTokenizer path)"
        enc = self.tokenizer(texts, truncation=True, max_length=self.max_length,
                             padding="max_length", return_tensors="np")
        return enc["input_ids"]


class FrozenOpenCLIPEmbedder(FrozenCLIPEmbedder):
    """SD2.x text conditioning: ViT-H tower, penultimate layer.

    (reference: models/stablediffusion/text_encoders.py:104-165)
    """

    def __init__(self, arch: str = "open-clip-vit-h", max_length: int = 77,
                 layer: str = "penultimate", tokenizer: Any = None,
                 config_overrides: Optional[dict] = None, **_: Any):
        cfg = dict(CLIP_TEXT_CONFIGS[arch])
        cfg.update(config_overrides or {})
        self.model = CLIPTextTransformer(max_length=max_length, **cfg)
        self.layer = layer
        self.layer_idx = None
        self.max_length = max_length
        self.tokenizer = tokenizer
        self.params = None

    def output_layer(self):
        return "penultimate" if self.layer == "penultimate" else "last"


class FrozenT5Embedder:
    """T5 text conditioning via HF Flax T5 (reference:
    models/stablediffusion/text_encoders.py:25-54, which likewise delegates
    to HF ``T5EncoderModel``).

    ``version`` must be a LOCAL checkpoint/tokenizer path in zero-egress
    environments; torch-format checkpoints convert in-loader (``from_pt``).
    ``module``/``params``/``tokenizer`` can also be injected directly.
    """

    def __init__(self, version: str = "google/t5-v1_1-large", max_length: int = 77,
                 module: Any = None, params: Any = None, tokenizer: Any = None,
                 dtype: Any = None, **_: Any):
        self.max_length = max_length
        self.module, self.params, self.tokenizer = module, params, tokenizer
        self._version = version
        self._dtype = dtype

    def _load(self, version: str, dtype: Any):
        import os

        from transformers import FlaxT5EncoderModel

        # local dirs with only torch weights need the pt->flax conversion
        from_pt = os.path.isdir(version) and not any(
            f.startswith("flax_model") for f in os.listdir(version))
        m = FlaxT5EncoderModel.from_pretrained(
            version, from_pt=from_pt, **({"dtype": dtype} if dtype else {}))
        self.module = m.module
        if self.params is None:  # keep directly-injected params
            self.params = {"params": m.params}

    def _ensure_loaded(self):
        if self.module is None:
            self._load(self._version, self._dtype)

    def tokenize(self, texts) -> np.ndarray:
        if self.tokenizer is None:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self._version)
        enc = self.tokenizer(texts, truncation=True, max_length=self.max_length,
                             padding="max_length", return_tensors="np")
        return enc["input_ids"]

    def encode_tokens(self, params, input_ids: Array) -> Array:
        self._ensure_loaded()
        out = self.module.apply(params, input_ids=jnp.asarray(input_ids, jnp.int32))
        return out.last_hidden_state

    def encode(self, texts) -> Array:
        self._ensure_loaded()
        return self.encode_tokens(self.params, jnp.asarray(self.tokenize(texts)))


class FrozenCLIPT5Encoder:
    """CLIP + T5 dual conditioning, returned as ``[clip_z, t5_z]``
    (reference: models/stablediffusion/text_encoders.py:167-182)."""

    def __init__(self, clip_version: str = "clip-vit-l", t5_version: str = "google/t5-v1_1-xl",
                 clip_max_length: int = 77, t5_max_length: int = 77,
                 clip_tokenizer: Any = None, t5_module: Any = None,
                 t5_params: Any = None, t5_tokenizer: Any = None, **_: Any):
        self.clip_encoder = FrozenCLIPEmbedder(clip_version, max_length=clip_max_length,
                                               tokenizer=clip_tokenizer)
        self.t5_encoder = FrozenT5Embedder(t5_version, max_length=t5_max_length,
                                           module=t5_module, params=t5_params,
                                           tokenizer=t5_tokenizer)

    def encode(self, texts, clip_params=None):
        clip_params = clip_params if clip_params is not None else self.clip_encoder.params
        clip_ids = jnp.asarray(self.clip_encoder.tokenize(texts))
        clip_z = self.clip_encoder.encode_tokens(clip_params, clip_ids)
        t5_z = self.t5_encoder.encode(texts)
        return [clip_z, t5_z]
