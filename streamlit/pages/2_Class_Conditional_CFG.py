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


@st.cache_resource
def load_model():
    conf = load_config(CONFIG)
    model = instantiate_from_config(conf.model)
    sys.path.append(os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "scripts"))
    from _common import load_model_params

    shape = (1, conf.data.params.img_size, conf.data.params.img_size,
             conf.data.get("img_channels", 3))
    params = load_model_params(
        WEIGHTS, model,
        (jnp.zeros(shape), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)))
    return conf, model, params, shape[1:]


st.title("Class-conditional Generation (CFG)")
sampler = st.selectbox("Sampler", ["ddpm", "ddim"])
steps = st.slider("Sampling steps", 5, 1000, 50)
scale = st.slider("Guidance scale", 0.0, 10.0, 3.0)
cls = st.number_input("Class id", value=0)
n = st.slider("Batch size", 1, 64, 16)
seed = st.number_input("Seed", value=0)

if st.button("Sample"):
    conf, model, params, shape = load_model()
    nc = conf.data.num_classes
    # cache the compiled sampler across Streamlit reruns (script re-executes
    # per interaction; a fresh jit object would retrace the whole scan)
    cache = st.session_state.setdefault("_cfg_samplers", {})
    cache_key = (sampler, steps, scale)
    if cache_key not in cache:
        dp = dict(conf.diffusion.get("params", {}))
        dp.pop("device", None)
        dp.update(respace_type="uniform", respace_steps=steps, guidance_scale=scale)
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

    k_noise, k_samp = jax.random.split(jax.random.PRNGKey(int(seed)))
    y = jnp.full((n,), int(cls), jnp.int32)
    out = np.clip(np.asarray(
        fn(params, jax.random.normal(k_noise, (n,) + shape), k_samp, y)), -1, 1)
    st.image(to_pil(make_grid(out, nrow=int(np.ceil(np.sqrt(n))))), width=512)
