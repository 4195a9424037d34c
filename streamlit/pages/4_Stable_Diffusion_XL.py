"""Stable Diffusion XL text-to-image page (parity: reference
streamlit/pages/4_Stable_Diffusion_XL.py — cond/uncond conditioner dicts,
:84-88).

Set DMTPU_SDXL_CONFIG (the sd_xl_base weight yaml), DMTPU_SDXL_WEIGHTS
(.safetensors) and DMTPU_CLIP_TOKENIZER / DMTPU_OPENCLIP_TOKENIZER (local
tokenizer paths).
"""
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import streamlit as st

from dmtpu.utils.setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from dmtpu.convert import load_torch_weights
from dmtpu.diffusions import DDIMCFG, DDPMCFG, DPMSolverPPCFG
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import to_pil

CONFIG = os.environ.get("DMTPU_SDXL_CONFIG", "weights/sdxl/sd_xl_base.yaml")
WEIGHTS = os.environ.get("DMTPU_SDXL_WEIGHTS")
TOKENIZER_L = os.environ.get("DMTPU_CLIP_TOKENIZER")
TOKENIZER_G = os.environ.get("DMTPU_OPENCLIP_TOKENIZER", TOKENIZER_L)


@st.cache_resource(max_entries=1)  # one resident weight tree (16 GB HBM)
def load_sdxl():
    conf = load_config(CONFIG)
    model = instantiate_from_config(conf.model)
    if WEIGHTS:
        params = model.load_state_dict(load_torch_weights(WEIGHTS))
    else:
        st.warning("DMTPU_SDXL_WEIGHTS not set — running with RANDOM weights (demo mode)")
        params = model.init_params(jax.random.PRNGKey(0))
    from transformers import CLIPTokenizer

    tok_l = CLIPTokenizer.from_pretrained(TOKENIZER_L)
    tok_g = CLIPTokenizer.from_pretrained(TOKENIZER_G)
    return conf, model, params, tok_l, tok_g


def tokenize(tok, texts):
    return jnp.asarray(tok(texts, truncation=True, max_length=77,
                           padding="max_length", return_tensors="np")["input_ids"])


st.title("Stable Diffusion XL")
prompt = st.text_area("Prompt", "a professional photograph of an astronaut riding a horse")
negative = st.text_area("Negative prompt", "")
sampler = st.selectbox("Sampler", ["DDIM", "DPM-Solver++", "DDPM"], index=0)
steps = st.slider("Steps", 5, 200, 50)
scale = st.slider("CFG scale", 1.0, 20.0, 5.0)
height = st.select_slider("Height", options=list(range(512, 1537, 128)), value=1024)
width = st.select_slider("Width", options=list(range(512, 1537, 128)), value=1024)
offset_noise = st.slider("Offset noise", 0.0, 0.2, 0.0)
batch_size = st.slider("Batch size", 1, 4, 1)
batch_count = st.slider("Batch count", 1, 8, 1)
respace_type = st.selectbox(
    "Respace type", ["uniform-linspace", "uniform-leading", "uniform-trailing"])
seed = st.number_input("Seed", value=-1, min_value=-1, max_value=2**32 - 1,
                       help="-1 draws a fresh random seed per run")
if seed == -1:
    seed = int(np.random.default_rng().integers(0, 2**32, dtype=np.uint32))

if st.button("Generate"):
    conf, model, params, tok_l, tok_g = load_sdxl()
    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    dp.update(respace_type=respace_type, respace_steps=steps,
              guidance_scale=scale, cond_kwarg="cond")
    diffuser = {"DDIM": DDIMCFG, "DPM-Solver++": DPMSolverPPCFG,
                "DDPM": DDPMCFG}[sampler](**dp)

    # conditioner cond/uncond dicts (reference page :84-88)
    sizes = dict(
        original_size=jnp.tile(jnp.array([[height, width]], jnp.float32), (batch_size, 1)),
        crop_coords=jnp.zeros((batch_size, 2), jnp.float32),
        target_size=jnp.tile(jnp.array([[height, width]], jnp.float32), (batch_size, 1)),
    )
    cond = model.conditioner(params["conditioner"],
                             tokenize(tok_l, [prompt] * batch_size),
                             tokenize(tok_g, [prompt] * batch_size), **sizes)
    uncond = model.conditioner(params["conditioner"],
                               tokenize(tok_l, [negative] * batch_size),
                               tokenize(tok_g, [negative] * batch_size),
                               force_zero_text=(negative == ""), **sizes)

    cache = st.session_state.setdefault("_sdxl_samplers", {})
    cache_key = (sampler, respace_type, steps, scale, height, width, batch_size)
    if cache_key not in cache:
        # params as a jit ARGUMENT: closing over the weight tree embeds
        # GBs of constants into the lowering
        @jax.jit
        def fn(p, noise, k, c, uc):
            return diffuser.sample(model.make_model_fn(p), noise, k,
                                   uncond_conditioning=uc, model_kwargs=dict(cond=c))

        if len(cache) >= 4:
            cache.pop(next(iter(cache)))
        cache[cache_key] = fn
    fn = cache[cache_key]

    for i in range(batch_count):
        k_noise, k_samp = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(seed)), i))
        noise = jax.random.normal(k_noise, (batch_size, height // 8, width // 8, 4))
        if offset_noise > 0:
            noise = noise + offset_noise * jax.random.normal(
                jax.random.fold_in(k_noise, 1), (batch_size, 1, 1, 1))
        z = fn(params, noise, k_samp, cond, uncond)
        imgs = np.clip(np.asarray(model.decode_latent(params, z)), -1, 1)
        for b in range(batch_size):
            st.image(to_pil(imgs[b]), width=width)
