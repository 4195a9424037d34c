"""Shared offline tiny fixtures: configs, npz weights, and a local CLIP dir.

Used by the streamlit generate-path tests and the CLIP-guidance
``from_pretrained`` test — everything is random-init and saved to disk so the
real loading seams (env-var config paths, ``from_pretrained`` on a local
directory) are exercised without any downloadable artifact.
"""
import json
import os

import jax
import numpy as np
import yaml


def write_yaml(path, obj):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)
    return str(path)


TINY_DIFFUSION = {
    "target": "diffusions.ddpm.DDPM",
    "params": {"total_steps": 100, "beta_schedule": "linear",
               "beta_start": 0.0001, "beta_end": 0.02,
               "objective": "pred_eps", "var_type": "fixed_large"},
}


def tiny_uncond_config(path):
    """Page-1 seam: tiny unconditional UNet at 8x8."""
    return write_yaml(path, {
        "seed": 0,
        "data": {"target": "datasets.cifar10.CIFAR10",
                 "params": {"root": "~", "img_size": 8},
                 "img_channels": 3, "num_classes": 10},
        "model": {"target": "models.unet.UNet",
                  "params": {"in_channels": 3, "out_channels": 3, "dim": 32,
                             "dim_mults": [1, 2], "use_attn": [False, True],
                             "num_res_blocks": 1, "n_heads": 1}},
        "diffusion": TINY_DIFFUSION,
    })


def tiny_cfg_config(path):
    """Page-2 seam: tiny class-conditional AdaGN UNet at 8x8."""
    return write_yaml(path, {
        "seed": 0,
        "data": {"target": "datasets.cifar10.CIFAR10",
                 "params": {"root": "~", "img_size": 8},
                 "img_channels": 3, "num_classes": 10},
        "model": {"target": "models.unet_categorial_adagn.UNetCategorialAdaGN",
                  "params": {"in_channels": 3, "out_channels": 3, "dim": 32,
                             "dim_mults": [1, 2], "use_attn": [False, True],
                             "num_res_blocks": 1, "num_classes": 10}},
        "diffusion": TINY_DIFFUSION,
    })


def _tiny_sd_model(context_dim=32, max_length=16):
    return {
        "target": "dmtpu.models.stablediffusion.StableDiffusion",
        "params": {
            "scale_factor": 0.18215,
            "unet_config": {
                "target": "dmtpu.models.stablediffusion.SDUNetModel",
                "params": {"in_channels": 4, "model_channels": 32,
                           "out_channels": 4, "num_res_blocks": 1,
                           "attention_resolutions": [2], "channel_mult": [1, 2],
                           "num_heads": 2, "use_spatial_transformer": True,
                           "transformer_depth": 1, "context_dim": context_dim,
                           "legacy": False}},
            "vae_config": {
                "target": "dmtpu.models.stablediffusion.AutoencoderKL",
                "params": {"embed_dim": 4, "z_channels": 4, "ch": 32,
                           "ch_mult": [1, 1, 1, 1], "num_res_blocks": 1,
                           "resolution": 64}},
            "text_encoder_config": {
                "target": "dmtpu.models.stablediffusion.FrozenCLIPEmbedder",
                "params": {"max_length": max_length,
                           "config_overrides": {"width": context_dim,
                                                "layers": 2, "heads": 4,
                                                "vocab_size": 256}}},
        },
    }


def tiny_sd_config(path, context_dim=32, max_length=16):
    """Page-3 seam: tiny StableDiffusion stack (UNet+VAE+CLIP text tower)."""
    return write_yaml(path, {
        "model": _tiny_sd_model(context_dim, max_length),
        "diffusion": {"target": "diffusions.ddpm.DDPM",
                      "params": {"total_steps": 100, "beta_schedule": "linear",
                                 "beta_start": 0.0001, "beta_end": 0.02,
                                 "objective": "pred_eps"}},
    })


def tiny_sd_train_config(path, tokenizer_dir, lora=None):
    """scripts/train_sd.py seam: tiny SD + synthetic captioned data.

    ``lora={"rank": 4}`` switches the script to LoRA fine-tuning.
    """
    extra = {"lora": dict(lora)} if lora else {}
    return write_yaml(path, {
        "seed": 0,
        "weights": None,
        "tokenizer": str(tokenizer_dir),
        "data": {"target": "dmtpu.data.captioned.SyntheticCaptioned",
                 "params": {"img_size": 32, "n": 32}},
        "dataloader": {"num_workers": 0},
        "model": _tiny_sd_model(),
        "diffusion": {"target": "diffusions.ddpm.DDPM",
                      "params": {"total_steps": 100, "beta_schedule": "quad",
                                 "beta_start": 0.00085, "beta_end": 0.012,
                                 "objective": "pred_eps"}},
        "train": {"n_steps": 3, "batch_size": 8, "micro_batch": 0,
                  "p_uncond": 0.25, "clip_grad_norm": 1.0,
                  "ema_decay": 0.99, "ema_dtype": "bfloat16",  # the sd15_finetune.yaml default path
                  "print_freq": 1, "save_freq": 2,
                  "sample_freq": 2, "sample_guidance_scale": 3.0,
                  "sample_respace_steps": 4, "sample_prompts": ["a cat"],
                  "optim": {"target": "dmtpu.utils.optim.adafactor",
                            "params": {"lr": 0.0001}}, **extra},
    })


def tiny_sdxl_config(path):
    """Page-4 seam: tiny SDXL stack (conditioner towers shrunk via
    clip_l/g_overrides; crossattn 32+64=96, vector 64+3*2*16=160)."""
    return write_yaml(path, {
        "model": {
            "target": "dmtpu.models.sdxl.StableDiffusionXL",
            "params": {
                "scale_factor": 0.13025,
                "conditioner_config": {
                    "target": "dmtpu.models.sdxl.SDXLConditioner",
                    "params": {"embed_dim": 16,
                               "clip_l_overrides": {"width": 32, "layers": 2,
                                                    "heads": 4, "vocab_size": 256},
                               "clip_g_overrides": {"width": 64, "layers": 2,
                                                    "heads": 4, "vocab_size": 256,
                                                    "projection_dim": 64}}},
                "unet_config": {
                    "target": "dmtpu.models.stablediffusion.SDUNetModel",
                    "params": {"in_channels": 4, "model_channels": 32,
                               "out_channels": 4, "num_res_blocks": 1,
                               "attention_resolutions": [2], "channel_mult": [1, 2],
                               "num_head_channels": 16, "use_spatial_transformer": True,
                               "transformer_depth": 1, "context_dim": 96,
                               "num_classes": "sequential", "adm_in_channels": 160,
                               "use_linear_in_transformer": True, "legacy": False}},
                "vae_config": {
                    "target": "dmtpu.models.stablediffusion.AutoencoderKL",
                    "params": {"embed_dim": 4, "z_channels": 4, "ch": 32,
                               "ch_mult": [1, 1, 1, 1], "num_res_blocks": 1,
                               "resolution": 64}},
            },
        },
        "diffusion": {"target": "diffusions.ddpm.DDPM",
                      "params": {"total_steps": 100, "beta_schedule": "linear",
                                 "beta_start": 0.0001, "beta_end": 0.02,
                                 "objective": "pred_eps"}},
    })


def save_npz_params(path, model, sample_args):
    """Random-init `model` and export the .npz layout scripts/_common.py's
    ``load_model_params`` reads (``data['params'].item()``)."""
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *sample_args)
    np.savez(path, params=jax.device_get(variables))
    return str(path)


def make_tiny_clip_dir(path):
    """A local directory loadable by BOTH ``FlaxCLIPModel.from_pretrained``
    and ``CLIPTokenizer.from_pretrained`` — tiny random-init towers plus a
    char-level BPE vocab (a-z)."""
    from transformers import (
        CLIPConfig,
        CLIPTextConfig,
        CLIPTokenizer,
        CLIPVisionConfig,
        FlaxCLIPModel,
    )

    os.makedirs(path, exist_ok=True)
    text = CLIPTextConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          max_position_embeddings=77, projection_dim=16)
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=64, patch_size=16, projection_dim=16)
    cfg = CLIPConfig(text_config=text.to_dict(), vision_config=vision.to_dict(), projection_dim=16)
    FlaxCLIPModel(cfg, seed=0).save_pretrained(str(path))

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab_file = os.path.join(str(path), "vocab.json")
    merges_file = os.path.join(str(path), "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(vocab, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
    CLIPTokenizer(vocab_file, merges_file).save_pretrained(str(path))
    return str(path)
