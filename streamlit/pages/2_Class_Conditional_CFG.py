"""Class-conditional CFG page (parity: reference streamlit/pages/2_...py)."""
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import streamlit as st

from dmtpu.utils.setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from dmtpu.diffusions import DDIMCFG, DDPMCFG
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import make_grid, to_pil

CONFIG = os.environ.get("DMTPU_CONFIG", "configs/ddpm_cfg_cifar10.yaml")
WEIGHTS = os.environ.get("DMTPU_WEIGHTS")
WEIGHTS_DIR = os.environ.get("DMTPU_WEIGHTS_DIR")


@st.cache_resource(max_entries=1)  # one resident weight tree (16 GB HBM)
def load_model(weights_path=None):
    conf = load_config(CONFIG)
    model = instantiate_from_config(conf.model)
    sys.path.append(os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "scripts"))
    from _common import load_model_params

    shape = (1, conf.data.params.img_size, conf.data.params.img_size,
             conf.data.get("img_channels", 3))
    params = load_model_params(
        weights_path or WEIGHTS, model,
        (jnp.zeros(shape), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)))
    return conf, model, params, shape[1:]


st.title("Class-conditional Generation (CFG)")
weights_choice = None
if WEIGHTS_DIR:
    from dmtpu.utils.misc import list_weight_files

    _found = list_weight_files(WEIGHTS_DIR)
    weights_choice = _found and st.selectbox("Model", options=_found) or None
sampler = st.selectbox("Sampler", ["ddpm", "ddim"])
steps = st.slider("Sampling steps", 5, 1000, 50)
scale = st.slider("Guidance scale", 0.0, 10.0, 3.0)
cls = st.number_input("Class id", value=0)
var_type = st.selectbox("Variance", ["fixed_small", "fixed_large"])
respace_type = st.selectbox(
    "Respace type", ["uniform-linspace", "uniform-leading", "uniform-trailing"])
n = st.slider("Batch size", 1, 64, 16)
batch_count = st.slider("Batch count", 1, 8, 1)
seed = st.number_input("Seed", value=-1, min_value=-1, max_value=2**32 - 1,
                       help="-1 draws a fresh random seed per run")
if seed == -1:
    seed = int(np.random.default_rng().integers(0, 2**32, dtype=np.uint32))

if st.button("Sample"):
    conf, model, params, shape = load_model(weights_choice)
    nc = conf.data.num_classes
    # cache the compiled sampler across Streamlit reruns (script re-executes
    # per interaction; a fresh jit object would retrace the whole scan)
    cache = st.session_state.setdefault("_cfg_samplers", {})
    cache_key = (sampler, steps, scale, var_type, respace_type)
    if cache_key not in cache:
        dp = dict(conf.diffusion.get("params", {}))
        dp.pop("device", None)
        dp.update(respace_type=respace_type, respace_steps=steps,
                  guidance_scale=scale, var_type=var_type)
        diffuser = (DDIMCFG if sampler == "ddim" else DDPMCFG)(**dp)

        @jax.jit
        def fn(p, noise, k, y):
            return diffuser.sample(
                lambda x, t, y=None, **kw: model.apply(p, x, t, y), noise, k,
                uncond_conditioning=jnp.full((noise.shape[0],), nc, jnp.int32),
                model_kwargs=dict(y=y))

        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[cache_key] = fn
    fn = cache[cache_key]

    y = jnp.full((n,), int(cls), jnp.int32)
    for i in range(batch_count):
        k_noise, k_samp = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(seed)), i))
        out = np.clip(np.asarray(
            fn(params, jax.random.normal(k_noise, (n,) + shape), k_samp, y)), -1, 1)
        st.image(to_pil(make_grid(out, nrow=int(np.ceil(np.sqrt(n))))), width=512)
