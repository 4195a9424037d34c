"""Unconditional sampling page (parity: reference streamlit/pages/1_...py)."""
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import streamlit as st

from dmtpu.utils.setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from dmtpu.diffusions import DDIM, DDPM, EulerSampler, HeunSampler, DPMSolverPP
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import make_grid, to_pil

CONFIG = os.environ.get("DMTPU_CONFIG", "configs/ddpm_cifar10.yaml")
WEIGHTS = os.environ.get("DMTPU_WEIGHTS")
SAMPLERS = {"ddpm": DDPM, "ddim": DDIM, "euler": EulerSampler, "heun": HeunSampler,
            "dpmpp": DPMSolverPP}


@st.cache_resource
def load_model():
    conf = load_config(CONFIG)
    model = instantiate_from_config(conf.model)
    sys.path.append(os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "scripts"))
    from _common import load_model_params

    shape = (1, conf.data.params.img_size, conf.data.params.img_size,
             conf.data.get("img_channels", 3))
    params = load_model_params(WEIGHTS, model, (jnp.zeros(shape), jnp.zeros((1,), jnp.int32)))
    return conf, model, params, shape[1:]


st.title("Unconditional Image Generation")
sampler = st.selectbox("Sampler", list(SAMPLERS))
steps = st.slider("Sampling steps", 5, 1000, 50)
var_type = st.selectbox("Variance", ["fixed_small", "fixed_large", "learned_range"])
n = st.slider("Batch size", 1, 64, 16)
seed = st.number_input("Seed", value=0)

if st.button("Sample"):
    conf, model, params, shape = load_model()
    # Streamlit re-executes this script per interaction: cache the jitted
    # sampler in session_state (keyed by its settings) so identical clicks
    # reuse the compiled executable instead of retracing the whole scan.
    cache = st.session_state.setdefault("_samplers", {})
    cache_key = (sampler, steps, var_type)
    if cache_key not in cache:
        dp = dict(conf.diffusion.get("params", {}))
        dp.pop("device", None)
        dp.update(respace_type="uniform", respace_steps=steps, var_type=var_type)
        diffuser = SAMPLERS[sampler](**dp)

        @jax.jit
        def fn(p, noise, k):
            return diffuser.sample(lambda x, t, **kw: model.apply(p, x, t), noise, k)

        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[cache_key] = fn
    fn = cache[cache_key]

    t0 = time.time()
    k_noise, k_samp = jax.random.split(jax.random.PRNGKey(int(seed)))
    out = np.clip(np.asarray(
        fn(params, jax.random.normal(k_noise, (n,) + shape), k_samp)), -1, 1)
    st.image(to_pil(make_grid(out, nrow=int(np.ceil(np.sqrt(n))))), width=512)
    st.caption(f"{n} samples in {time.time() - t0:.2f}s on {jax.devices()[0].device_kind}")
