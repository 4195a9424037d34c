"""Stable Diffusion checkpoint conversion (CompVis / open_clip / diffusers layouts).

Implements the reference's state-dict surgery
(reference: models/stablediffusion/stablediffusion.py:73-79 — VAE under
``first_stage_model.``, UNet under ``model.diffusion_model.``; text encoder
under ``cond_stage_model.``) on top of the structural matcher.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dmtpu.convert.common import convert_by_structure


def _strip(state_dict: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}


def openclip_text_to_hf(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rewrite an open_clip text tower state_dict into the HF CLIPText layout
    used by ``CLIPTextTransformer`` (fused in_proj split into q/k/v)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "token_embedding.weight":
            out["embeddings.token_embedding.weight"] = v
        elif k == "positional_embedding":
            out["embeddings.position_embedding.weight"] = v
        elif k == "text_projection":
            out["text_projection"] = v
        elif k == "ln_final.weight":
            out["final_layer_norm.weight"] = v
        elif k == "ln_final.bias":
            out["final_layer_norm.bias"] = v
        elif ".attn.in_proj_weight" in k or ".attn.in_proj_bias" in k:
            layer = k.split("resblocks.")[1].split(".")[0]
            leaf = "weight" if k.endswith("weight") else "bias"
            q, kk, vv = np.split(v, 3, axis=0)
            base = f"encoder.layers.{layer}.self_attn"
            out[f"{base}.q_proj.{leaf}"] = q
            out[f"{base}.k_proj.{leaf}"] = kk
            out[f"{base}.v_proj.{leaf}"] = vv
        elif ".resblocks." in k:
            layer = k.split("resblocks.")[1].split(".")[0]
            rest = k.split(f"resblocks.{layer}.")[1]
            rest = (rest
                    .replace("attn.out_proj", "self_attn.out_proj")
                    .replace("ln_1", "layer_norm1")
                    .replace("ln_2", "layer_norm2")
                    .replace("mlp.c_fc", "mlp.fc1")
                    .replace("mlp.c_proj", "mlp.fc2"))
            out[f"encoder.layers.{layer}.{rest}"] = v
        elif k in ("logit_scale", "attn_mask"):
            continue
        else:
            continue
    return out


def hf_clip_text_strip(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF CLIPTextModel state_dict → our layout (drop buffers/prefix)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("text_model.", "")
        if k.endswith("position_ids"):
            continue
        out[k] = v
    return out


def diffusers_vae_to_compvis(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers AutoencoderKL state_dict → CompVis key layout.

    Handles both modern (to_q/to_k/to_v/to_out.0) and legacy
    (query/key/value/proj_attn) diffusers attention names; attention Linear
    weights are reshaped into the CompVis 1x1-conv layout.
    """
    # infer number of decoder levels for up-block index reversal
    n_up = 1 + max(
        (int(k.split("up_blocks.")[1].split(".")[0]) for k in sd if "up_blocks." in k),
        default=0,
    )
    attn_map = {
        "group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "proj_out",
        "query": "q", "key": "k", "value": "v", "proj_attn": "proj_out",
    }
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("mid_block.resnets.0", "mid.block_1")
        nk = nk.replace("mid_block.resnets.1", "mid.block_2")
        nk = nk.replace("mid_block.attentions.0", "mid.attn_1")
        if ".down_blocks." in nk:
            nk = nk.replace("down_blocks.", "down.")
            nk = nk.replace(".resnets.", ".block.")
            nk = nk.replace(".downsamplers.0.conv", ".downsample.conv")
        if ".up_blocks." in nk:
            i = int(nk.split("up_blocks.")[1].split(".")[0])
            nk = nk.replace(f"up_blocks.{i}.", f"up.{n_up - 1 - i}.")
            nk = nk.replace(".resnets.", ".block.")
            nk = nk.replace(".upsamplers.0.conv", ".upsample.conv")
        nk = nk.replace("conv_norm_out", "norm_out")
        nk = nk.replace(".conv_shortcut.", ".nin_shortcut.")
        if ".attn_1." in nk:
            for a, b in attn_map.items():
                if f".attn_1.{a}." in nk:
                    nk = nk.replace(f".attn_1.{a}.", f".attn_1.{b}.")
                    break
            if nk.endswith("weight") and v.ndim == 2:
                v = v[:, :, None, None]  # Linear -> 1x1 conv
        out[nk] = v
    return out


def convert_sd_checkpoint(wrapper, state_dict: Dict[str, np.ndarray],
                          text_encoder_sd: Optional[Dict[str, np.ndarray]] = None) -> Dict:
    """Full SD checkpoint → {"unet", "vae", "text_encoder"} flax params.

    ``state_dict``: the CompVis .ckpt/.safetensors contents (numpy values).
    ``text_encoder_sd``: optional separate text-encoder state_dict; if absent
    the checkpoint's own ``cond_stage_model.`` weights are used.
    """
    import jax
    import jax.numpy as jnp

    unet_sd = _strip(state_dict, "model.diffusion_model.")
    vae_sd = _strip(state_dict, "first_stage_model.")

    unet = wrapper.unet
    unet_init = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, unet.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, unet.context_dim)),
        jnp.zeros((1, wrapper.unet.adm_in_channels), jnp.float32)
        if unet.num_classes == "sequential" else None,
    )
    unet_params = convert_by_structure(unet_sd, unet_init)

    vae = wrapper.vae
    vae_init = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, vae.in_channels)),
        jnp.zeros((2,), jnp.uint32),
    )
    vae_params = convert_by_structure(vae_sd, vae_init)

    te_params = None
    if text_encoder_sd is None:
        if any(k.startswith("cond_stage_model.model.") for k in state_dict):
            text_encoder_sd = openclip_text_to_hf(_strip(state_dict, "cond_stage_model.model."))
        elif any(k.startswith("cond_stage_model.transformer.") for k in state_dict):
            text_encoder_sd = hf_clip_text_strip(_strip(state_dict, "cond_stage_model.transformer."))
    else:
        if any(".resblocks." in k for k in text_encoder_sd):
            text_encoder_sd = openclip_text_to_hf(text_encoder_sd)
        else:
            text_encoder_sd = hf_clip_text_strip(text_encoder_sd)
    if text_encoder_sd:
        te = wrapper.text_encoder
        te_init = jax.eval_shape(
            te.model.init, jax.random.PRNGKey(0), jnp.zeros((1, te.max_length), jnp.int32),
        )
        # pooled path params (text_projection) only exist when requested
        te_params = convert_by_structure(text_encoder_sd, te_init, strict=False)

    return {"unet": unet_params, "vae": vae_params, "text_encoder": te_params}


def convert_sdxl_checkpoint(wrapper, state_dict: Dict[str, np.ndarray],
                            clip_l_sd: Optional[Dict[str, np.ndarray]] = None,
                            clip_g_sd: Optional[Dict[str, np.ndarray]] = None) -> Dict:
    """SDXL base checkpoint → {"unet","vae","conditioner"} flax params.

    The sgm checkpoint stores the conditioner under
    ``conditioner.embedders.0.transformer.text_model.*`` (CLIP-L, HF layout)
    and ``conditioner.embedders.1.model.*`` (bigG, open_clip layout);
    separate ``clip_l_sd``/``clip_g_sd`` override those if given.
    """
    import jax
    import jax.numpy as jnp

    unet = wrapper.unet
    unet_init = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, unet.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, unet.context_dim)),
        jnp.zeros((1, unet.adm_in_channels), jnp.float32),
    )
    unet_params = convert_by_structure(_strip(state_dict, "model.diffusion_model."), unet_init)

    vae = wrapper.vae
    vae_init = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, vae.in_channels)),
        jnp.zeros((2,), jnp.uint32),
    )
    vae_params = convert_by_structure(_strip(state_dict, "first_stage_model."), vae_init)

    if clip_l_sd is None:
        clip_l_sd = _strip(state_dict, "conditioner.embedders.0.transformer.")
    if clip_g_sd is None:
        clip_g_sd = _strip(state_dict, "conditioner.embedders.1.model.")

    cond = wrapper.conditioner
    cond_params = None
    if clip_l_sd or clip_g_sd:
        ids = jnp.zeros((1, 77), jnp.int32)
        cond_params = {}
        if clip_l_sd:
            init_l = jax.eval_shape(cond.clip_l.init, jax.random.PRNGKey(0), ids)
            cond_params["clip_l"] = convert_by_structure(
                hf_clip_text_strip(clip_l_sd), init_l, strict=False)
        if clip_g_sd:
            init_g = jax.eval_shape(
                cond.clip_g.init, jax.random.PRNGKey(0), ids,
                output_layer="penultimate", return_pooled=True)
            clip_g_sd = openclip_text_to_hf(clip_g_sd) if any(
                ".resblocks." in k for k in clip_g_sd) else hf_clip_text_strip(clip_g_sd)
            cond_params["clip_g"] = convert_by_structure(clip_g_sd, init_g, strict=False)

    return {"unet": unet_params, "vae": vae_params, "conditioner": cond_params}

