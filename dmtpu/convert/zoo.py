"""Per-architecture conversion entry points.

Each takes the upstream torch state_dict (numpy values) and the target
model's ``init`` output, returning a ready params tree.  All are thin
wrappers over the structural matcher with arch-specific key filtering.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dmtpu.convert.common import convert_by_structure


def convert_pesser(state_dict: Dict[str, np.ndarray], init_params) -> Dict:
    return convert_by_structure(state_dict, init_params)


def convert_adm(state_dict: Dict[str, np.ndarray], init_params) -> Dict:
    return convert_by_structure(state_dict, init_params)


def combine_adm_weights(cond_sd: Dict[str, np.ndarray],
                        uncond_sd: Dict[str, np.ndarray],
                        init_params) -> Dict:
    """Fuse OpenAI's separately-trained conditional + unconditional ADM
    checkpoints into one ``UNetCombined`` params tree for classifier-free
    guidance (reference: models/adm/unet_combined.py:27-32 — the torch
    version prefixes the two state_dicts ``unet_cond.``/``unet_uncond.``
    and saves; here the prefixed dict converts structurally against the
    combined module's init)."""
    merged = {f"unet_cond.{k}": v for k, v in cond_sd.items()}
    merged.update({f"unet_uncond.{k}": v for k, v in uncond_sd.items()})
    return convert_by_structure(merged, init_params)


def convert_dit(state_dict: Dict[str, np.ndarray], init_params) -> Dict:
    """DiT: the frozen sin/cos pos_embed buffer is recomputed, not loaded."""

    def rename(k: str) -> Optional[str]:
        if k == "pos_embed":
            return None
        return k

    return convert_by_structure(state_dict, init_params, rename=rename)


def convert_mdt(state_dict: Dict[str, np.ndarray], init_params) -> Dict:
    """MDTv2: pos embeds are trainable; rel-pos index buffers are recomputed."""

    def rename(k: str) -> Optional[str]:
        if k.endswith("relative_position_index"):
            return None
        # everything else (incl. raw pos_embed / mask_token params) keeps
        # its torch name; the structural matcher handles the layout
        return k

    return convert_by_structure(state_dict, init_params, rename=rename)


def convert_mmdit(state_dict: Dict[str, np.ndarray], init_params) -> Dict:
    """SD3 / SD3.5 MMDiT checkpoint → dmtpu ``MMDiT`` params (beyond parity).

    Source layout: the official ``sd3_medium.safetensors`` /
    ``sd3.5_large.safetensors`` release (sgm ``MMDiTX`` module naming, keys
    under ``model.diffusion_model.``); mirrors the reference's
    per-architecture loaders (reference: utils/load.py:7-19 pattern).
    Key map (dst names are this repo's ``dmtpu/models/mmdit.py`` modules):

      x_embedder.proj.{weight,bias}        -> x_embedder (patchify Conv)
      t_embedder.mlp.{0,2}.*               -> t_mlp0 / t_mlp2
      y_embedder.mlp.{0,2}.*               -> pooled_mlp0 / pooled_mlp2
      context_embedder.*                   -> context_embedder
      pos_embed                            -> dropped: recomputed sincos;
                                              set ``pos_embed_max_size`` on
                                              the model to SD3's base grid
                                              (192) for the center-crop
                                              convention the ckpt trained with
      joint_blocks.{i}.{x,context}_block.
        adaLN_modulation.1.*               -> blocks.{i}.{x,ctx}_adaLN
        attn.qkv.*                         -> blocks.{i}.{x,ctx}_qkv
        attn.proj.*                        -> blocks.{i}.{x,ctx}_proj
        attn.ln_{q,k}.weight (SD3.5 RMS)   -> blocks.{i}.{x,ctx}_qknorm.
                                              {q,k}_norm.scale
        mlp.fc{1,2}.*                      -> blocks.{i}.{x,ctx}_mlp.fc{1,2}
      final_layer.adaLN_modulation.1.* /
        final_layer.linear.*               -> final_layer (structural match)

    VAE / text-encoder tensors bundled in the single-file release are
    skipped (convert them against the autoencoder/text-tower modules).
    SD3.5-medium's dual-attention (``attn2``) MMDiT-X blocks are not
    representable in this MMDiT and fail loudly.  Chunk ORDER inside the
    fused qkv and adaLN tensors matches upstream (q|k|v; shift|scale|gate
    per msa/mlp), so no re-slicing is needed beyond the Dense transpose.
    """
    _BLOCK_MAP = (
        ("adaLN_modulation.1.", "{s}_adaLN."),
        ("attn.qkv.", "{s}_qkv."),
        ("attn.proj.", "{s}_proj."),
        ("attn.ln_q.weight", "{s}_qknorm.q_norm.weight"),
        ("attn.ln_k.weight", "{s}_qknorm.k_norm.weight"),
        ("mlp.fc1.", "{s}_mlp.fc1."),
        ("mlp.fc2.", "{s}_mlp.fc2."),
    )

    def rename(k: str) -> Optional[str]:
        if k.startswith("model.diffusion_model."):
            k = k[len("model.diffusion_model."):]
        elif k.startswith(("first_stage_model.", "vae.", "text_encoders.",
                           "conditioner.", "model.")):
            return None
        if ".attn2." in k:
            raise ValueError(
                "SD3.5-medium MMDiT-X dual-attention (attn2) checkpoints are "
                "not supported by dmtpu MMDiT (single joint attention)")
        if k == "pos_embed" or k.endswith(".pos_embed"):
            return None
        for src, dst in (("x_embedder.proj.", "x_embedder."),
                         ("t_embedder.mlp.0.", "t_mlp0."),
                         ("t_embedder.mlp.2.", "t_mlp2."),
                         ("y_embedder.mlp.0.", "pooled_mlp0."),
                         ("y_embedder.mlp.2.", "pooled_mlp2.")):
            if k.startswith(src):
                return dst + k[len(src):]
        if k.startswith("joint_blocks."):
            _, i, block, rest = k.split(".", 3)
            stream = "x" if block == "x_block" else "ctx"
            for src, dst in _BLOCK_MAP:
                if rest.startswith(src) or rest == src:
                    return f"blocks.{i}." + dst.format(s=stream) \
                        + rest[len(src):]
            raise ValueError(f"unrecognised MMDiT block tensor: {k}")
        return k

    return convert_by_structure(state_dict, init_params, rename=rename)
