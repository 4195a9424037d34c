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

from dmtpu.diffusions import DDIMCFG, DDPMCFG, DPMSolverPPCFG, PFDiffDDIMCFG
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import to_pil

CONFIG = os.environ.get("DMTPU_SD_CONFIG", "weights/stablediffusion/v1-inference.yaml")
WEIGHTS = os.environ.get("DMTPU_SD_WEIGHTS")
# optional: a directory to scan for weights, shown as a dropdown (the
# reference page's model selector, reference :131-135)
WEIGHTS_DIR = os.environ.get("DMTPU_SD_WEIGHTS_DIR")
TOKENIZER = os.environ.get("DMTPU_CLIP_TOKENIZER")

_SAMPLERS = {"ddim": DDIMCFG, "ddpm": DDPMCFG, "dpmpp": DPMSolverPPCFG,
             "pfdiff": PFDiffDDIMCFG}


@st.cache_resource(max_entries=1)  # one resident weight tree (16 GB HBM)
def load_sd(weights_path=None):
    conf = load_config(CONFIG)
    sd = instantiate_from_config(conf.model)
    if TOKENIZER:
        from transformers import CLIPTokenizer

        sd.text_encoder.tokenizer = CLIPTokenizer.from_pretrained(TOKENIZER)
    weights = weights_path or WEIGHTS
    if weights:
        # .ckpt/.safetensors (converted) or a merged-LoRA .npz
        params = sd.load_weights(weights)
    else:
        st.warning("DMTPU_SD_WEIGHTS not set — running with RANDOM weights (demo mode)")
        params = sd.init_params(jax.random.PRNGKey(0))
    return conf, sd, params


st.title("Stable Diffusion")
weights_choice = None
if WEIGHTS_DIR:
    from dmtpu.utils.misc import list_weight_files

    _found = list_weight_files(WEIGHTS_DIR)
    weights_choice = _found and st.selectbox("Model", options=_found) or None
prompt = st.text_area("Prompt", "a photograph of an astronaut riding a horse")
negative = st.text_area("Negative prompt", "")
sampler = st.selectbox("Sampler", ["ddim", "ddpm", "dpmpp", "pfdiff"])
steps = st.slider("Steps", 5, 200, 50)
scale = st.slider("CFG scale", 1.0, 20.0, 7.5)
height = st.select_slider("Height", options=list(range(128, 1025, 128)), value=512)
width = st.select_slider("Width", options=list(range(128, 1025, 128)), value=512)
offset_noise = st.slider("Offset noise", 0.0, 0.2, 0.0)
tome_ratio = st.slider(
    "Token merging (ToMe) ratio", 0.0, 0.75, 0.0, step=0.05,
    help="merge the most redundant self-attention tokens at the full-res "
         "level (dmtpu/ops/tome.py) — ~1.3-1.5x faster at 0.5, near-baseline quality")
freeu = st.checkbox(
    "FreeU", value=False,
    help="training-free backbone/skip re-weighting at the two deepest "
         "decoder stages (dmtpu/ops/freeu.py, SD1.5 paper settings)")
batch_size = st.slider("Batch size", 1, 8, 1)
batch_count = st.slider("Batch count", 1, 8, 1)
respace_type = st.selectbox(
    "Respace type", ["uniform-linspace", "uniform-leading", "uniform-trailing"])
seed = st.number_input("Seed", value=-1, min_value=-1, max_value=2**32 - 1,
                       help="-1 draws a fresh random seed per run (reference :160-162)")
if seed == -1:
    seed = int(np.random.default_rng().integers(0, 2**32, dtype=np.uint32))

if st.button("Generate"):
    conf, sd, params = load_sd(weights_choice)
    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    if sampler != "ddpm":
        dp.pop("var_type", None)  # ancestral-only knob
    dp.update(respace_type=respace_type, respace_steps=steps,
              guidance_scale=scale, cond_kwarg="text_embed")
    text_embed = sd.text_encoder_encode(params, [prompt] * batch_size)
    neg_embed = sd.text_encoder_encode(params, [negative] * batch_size)

    # cache the compiled sampler across Streamlit reruns (script re-executes
    # per interaction; a fresh jit object would retrace the whole scan)
    cache = st.session_state.setdefault("_sd_samplers", {})
    cache_key = (sampler, respace_type, steps, scale, height, width, batch_size,
                 tome_ratio, freeu)
    if cache_key not in cache:
        from dmtpu.ops.freeu import SD15_DEFAULTS

        diffuser = _SAMPLERS[sampler](**dp)
        # a LOCAL ToMe/FreeU-enabled clone (params unchanged) so every
        # cached fn stays bound to the unet it was traced with
        unet_m = sd.unet.clone(tome_ratio=float(tome_ratio),
                               freeu=SD15_DEFAULTS if freeu else None)

        # params as a jit ARGUMENT: closing over the weight tree embeds
        # GBs of constants into the lowering
        @jax.jit
        def fn(p, noise, k, ce, ue):
            def model_fn(x, t, text_embed=None, **kw):
                return unet_m.apply(p["unet"], x, t, context=text_embed)

            return diffuser.sample(model_fn, noise, k,
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
