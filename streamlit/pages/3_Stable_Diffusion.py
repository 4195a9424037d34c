"""Stable Diffusion text-to-image page (parity: reference streamlit/pages/3_...py,
full widget surface incl. offset noise / batch size / batch count / H×W,
reference :48-77).

Set DMTPU_SD_CONFIG (a reference weight yaml), DMTPU_SD_WEIGHTS (.ckpt /
.safetensors) and DMTPU_CLIP_TOKENIZER (local CLIPTokenizer path).  Without
DMTPU_SD_WEIGHTS the page runs with random-init weights (demo mode).
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

from dmtpu.diffusions import DDIMCFG, DPMSolverPPCFG
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import to_pil

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
    if WEIGHTS:
        # .ckpt/.safetensors (converted) or a merged-LoRA .npz
        params = sd.load_weights(WEIGHTS)
    else:
        st.warning("DMTPU_SD_WEIGHTS not set — running with RANDOM weights (demo mode)")
        params = sd.init_params(jax.random.PRNGKey(0))
    return conf, sd, params


st.title("Stable Diffusion")
prompt = st.text_area("Prompt", "a photograph of an astronaut riding a horse")
negative = st.text_area("Negative prompt", "")
sampler = st.selectbox("Sampler", ["ddim", "dpmpp"])
steps = st.slider("Steps", 5, 200, 50)
scale = st.slider("CFG scale", 1.0, 20.0, 7.5)
height = st.selectbox("Height", [512, 576, 640, 768], index=0)
width = st.selectbox("Width", [512, 576, 640, 768], index=0)
offset_noise = st.slider("Offset noise", 0.0, 0.2, 0.0)
batch_size = st.slider("Batch size", 1, 8, 1)
batch_count = st.slider("Batch count", 1, 8, 1)
seed = st.number_input("Seed", value=0)

if st.button("Generate"):
    conf, sd, params = load_sd()
    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    dp.update(respace_type="uniform", respace_steps=steps,
              guidance_scale=scale, cond_kwarg="text_embed")
    text_embed = sd.text_encoder_encode(params, [prompt] * batch_size)
    neg_embed = sd.text_encoder_encode(params, [negative] * batch_size)

    # cache the compiled sampler across Streamlit reruns (script re-executes
    # per interaction; a fresh jit object would retrace the whole scan)
    cache = st.session_state.setdefault("_sd_samplers", {})
    cache_key = (sampler, steps, scale, height, width, batch_size)
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

    for i in range(batch_count):
        k = jax.random.fold_in(jax.random.PRNGKey(int(seed)), i)
        k_noise, k_samp = jax.random.split(k)
        noise = jax.random.normal(k_noise, (batch_size, height // 8, width // 8, 4))
        if offset_noise > 0:
            # per-sample constant offset added to the init noise
            # (reference page :98-100)
            noise = noise + offset_noise * jax.random.normal(
                jax.random.fold_in(k_noise, 1), (batch_size, 1, 1, 1))
        z = fn(params, noise, k_samp, text_embed, neg_embed)
        imgs = np.clip(np.asarray(sd.decode_latent(params, z)), -1, 1)
        for b in range(batch_size):
            st.image(to_pil(imgs[b]), width=width)
