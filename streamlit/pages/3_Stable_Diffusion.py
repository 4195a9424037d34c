"""Stable Diffusion text-to-image page (parity: reference streamlit/pages/3_...py).

Set DMTPU_SD_CONFIG (a reference weight yaml), DMTPU_SD_WEIGHTS (.ckpt /
.safetensors) and DMTPU_CLIP_TOKENIZER (local CLIPTokenizer path).
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
from dmtpu.diffusions import DDIMCFG, DPMSolverPPCFG
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import make_grid, to_pil

CONFIG = os.environ.get("DMTPU_SD_CONFIG", "weights/stablediffusion/v1-inference.yaml")
WEIGHTS = os.environ.get("DMTPU_SD_WEIGHTS")
TOKENIZER = os.environ.get("DMTPU_CLIP_TOKENIZER")


@st.cache_resource
def load_sd():
    conf = load_config(CONFIG)
    sd = instantiate_from_config(conf.model)
    if TOKENIZER:
        from transformers import CLIPTokenizer

        sd.text_encoder.tokenizer = CLIPTokenizer.from_pretrained(TOKENIZER)
    params = sd.load_state_dict(load_torch_weights(WEIGHTS))
    return conf, sd, params


st.title("Stable Diffusion")
prompt = st.text_area("Prompt", "a photograph of an astronaut riding a horse")
negative = st.text_area("Negative prompt", "")
sampler = st.selectbox("Sampler", ["ddim", "dpmpp"])
steps = st.slider("Steps", 5, 200, 50)
scale = st.slider("CFG scale", 1.0, 20.0, 7.5)
size = st.selectbox("Size", [512, 576, 640, 768], index=0)
seed = st.number_input("Seed", value=0)

if st.button("Generate"):
    conf, sd, params = load_sd()
    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    dp.update(respace_type="uniform", respace_steps=steps,
              guidance_scale=scale, cond_kwarg="text_embed")
    text_embed = sd.text_encoder_encode(params, [prompt])
    neg_embed = sd.text_encoder_encode(params, [negative])

    # cache the compiled sampler across Streamlit reruns (script re-executes
    # per interaction; a fresh jit object would retrace the whole scan)
    cache = st.session_state.setdefault("_sd_samplers", {})
    cache_key = (sampler, steps, scale, size)
    if cache_key not in cache:
        cls = DPMSolverPPCFG if sampler == "dpmpp" else DDIMCFG
        diffuser = cls(**dp)

        # params as a jit ARGUMENT: closing over the weight tree embeds
        # GBs of constants into the lowering
        @jax.jit
        def fn(p, noise, k, ce, ue):
            return diffuser.sample(sd.make_model_fn(p), noise, k,
                                   uncond_conditioning=ue,
                                   model_kwargs=dict(text_embed=ce))

        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[cache_key] = fn
    fn = cache[cache_key]

    k_noise, k_samp = jax.random.split(jax.random.PRNGKey(int(seed)))
    z = fn(params, jax.random.normal(k_noise, (1, size // 8, size // 8, 4)),
           k_samp, text_embed, neg_embed)
    img = np.clip(np.asarray(sd.decode_latent(params, z)), -1, 1)
    st.image(to_pil(img[0]), width=size)
