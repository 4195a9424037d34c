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
