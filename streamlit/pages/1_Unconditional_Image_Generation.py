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

from dmtpu.diffusions import (
    DDIM, DDPM, DPMSolverPP, EulerSampler, FlowDPMSolver, FlowMatching,
    HeunSampler, PFDiffDDIM)
from dmtpu.utils.config import instantiate_from_config, load_config
from dmtpu.utils.image import make_grid, to_pil

CONFIG = os.environ.get("DMTPU_CONFIG", "configs/ddpm_cifar10.yaml")
WEIGHTS = os.environ.get("DMTPU_WEIGHTS")
# optional: directory scanned into a Model dropdown (reference :141-148)
WEIGHTS_DIR = os.environ.get("DMTPU_WEIGHTS_DIR")

@st.cache_resource(max_entries=1)  # streamlit reruns the page per widget
def _load_conf():
    return load_config(CONFIG)


# A flow/velocity-trained checkpoint and an eps-trained one are not
# sampler-interchangeable (same gate as webui/app.py): offer only the
# family matching the config's diffusion target.
try:
    IS_FLOW = "flow" in str(_load_conf().diffusion.get("target", "")).lower()
except Exception as e:  # bad DMTPU_CONFIG: a UI error beats a raw traceback
    st.error(f"cannot read config {CONFIG!r}: {e}")
    st.stop()
    raise
SAMPLERS = ({"flow": FlowMatching, "flowdpm": FlowDPMSolver} if IS_FLOW else
            {"ddpm": DDPM, "ddim": DDIM, "euler": EulerSampler,
             "heun": HeunSampler, "dpmpp": DPMSolverPP, "pfdiff": PFDiffDDIM})


@st.cache_resource(max_entries=1)  # one resident weight tree (16 GB HBM)
def load_model(weights_path=None):
    conf = _load_conf()
    model = instantiate_from_config(conf.model)
    sys.path.append(os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "scripts"))
    from _common import load_model_params

    shape = (1, conf.data.params.img_size, conf.data.params.img_size,
             conf.data.get("img_channels", 3))
    params = load_model_params(weights_path or WEIGHTS, model,
                               (jnp.zeros(shape), jnp.zeros((1,), jnp.int32)))
    return conf, model, params, shape[1:]


st.title("Unconditional Image Generation")
weights_choice = None
if WEIGHTS_DIR:
    from dmtpu.utils.misc import list_weight_files

    _found = list_weight_files(WEIGHTS_DIR)
    weights_choice = _found and st.selectbox("Model", options=_found) or None
sampler = st.selectbox("Sampler", list(SAMPLERS))
steps = st.slider("Sampling steps", 5, 1000, 50)
var_type = st.selectbox("Variance", ["fixed_small", "fixed_large", "learned_range"])
# the flow family names its step grids differently (flow.py _UNIFORM_TYPES;
# "uniform-linspace" is eps-family-only and rejected by FlowMatching)
respace_type = st.selectbox(
    "Respace type",
    ["uniform", "uniform-leading", "uniform-trailing", "quad"] if IS_FLOW else
    ["uniform-linspace", "uniform-leading", "uniform-trailing"])
n = st.slider("Batch size", 1, 64, 16)
batch_count = st.slider("Batch count", 1, 8, 1)
seed = st.number_input("Seed", value=-1, min_value=-1, max_value=2**32 - 1,
                       help="-1 draws a fresh random seed per run")
if seed == -1:
    seed = int(np.random.default_rng().integers(0, 2**32, dtype=np.uint32))

if st.button("Sample"):
    conf, model, params, shape = load_model(weights_choice)
    # Streamlit re-executes this script per interaction: cache the jitted
    # sampler in session_state (keyed by its settings) so identical clicks
    # reuse the compiled executable instead of retracing the whole scan.
    cache = st.session_state.setdefault("_samplers", {})
    cache_key = (sampler, steps, var_type, respace_type)
    if cache_key not in cache:
        dp = dict(conf.diffusion.get("params", {}))
        dp.pop("device", None)
        dp.update(respace_type=respace_type, respace_steps=steps, var_type=var_type)
        if sampler == "flowdpm":
            # flow configs pin solver: euler/heun; FlowDPMSolver IS the solver
            dp["solver"] = "dpm"
        diffuser = SAMPLERS[sampler](**dp)

        @jax.jit
        def fn(p, noise, k):
            return diffuser.sample(lambda x, t, **kw: model.apply(p, x, t), noise, k)

        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[cache_key] = fn
    fn = cache[cache_key]

    t0 = time.time()
    for i in range(batch_count):
        k_noise, k_samp = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(seed)), i))
        out = np.clip(np.asarray(
            fn(params, jax.random.normal(k_noise, (n,) + shape), k_samp)), -1, 1)
        st.image(to_pil(make_grid(out, nrow=int(np.ceil(np.sqrt(n))))), width=512)
    st.caption(f"{n * batch_count} samples in {time.time() - t0:.2f}s "
               f"on {jax.devices()[0].device_kind}")
