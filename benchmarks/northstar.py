"""North-star benchmark models + timing (BASELINE.md "Rebuild performance targets").

Two workloads, random-init weights (throughput only — conversion parity is
tested separately in tests/):

- **SD1.5 512²**: the v1-inference.yaml UNet (reference:
  models/stablediffusion/unet.py:422-808 instantiated per
  weights/stablediffusion/v1-inference.yaml), DDIM-50 over 64×64×4 latents.
  XLA-counted cost: 788.7 GFLOPs/step (2 flops per MAC).
- **DiT-XL/2 256²**: reference models/dit/model.py:332 config, DDIM-50 over
  32×32×4 latents.  XLA-counted cost: 237.9 GFLOPs/step (the DiT paper's
  "118.6 Gflops" counts MACs, i.e. the same number).

A100 baselines (documented derivation, since the reference publishes no
throughput numbers and this image has zero egress):

- A100-80GB bf16/fp16 dense peak = 312 TFLOPS.  Eager PyTorch + xformers /
  SDPA inference at batch ≥8 typically sustains 20-35% MFU on LDM UNets and
  30-40% on ViTs (it has no cross-step fusion; each step relaunches kernels).
- SD1.5: 39.4 TF/sample (50 × 788.7 GF) → at 20% MFU = 1.58 samples/s.
  **Baseline: 1.6 samples/s/chip.**
- DiT-XL/2: 11.9 TF/sample (50 × 237.9 GF) → at 35% MFU = 9.2 samples/s.
  **Baseline: 9.0 samples/s/chip.**

TPU v5e (1 chip) bf16 peak = 197 TFLOPS; parity therefore requires reaching
~32% (SD1.5) / ~54% (DiT) MFU on v5e — the MFU each workload sustains is
printed alongside throughput.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

# XLA-counted GFLOPs per model forward (see module docstring)
SD15_GFLOPS_PER_STEP = 788.7
DIT_XL2_GFLOPS_PER_STEP = 237.9
SDXL_GFLOPS_PER_STEP = 7005.5  # 1024², measured via compiled cost_analysis
A100_BASELINE_SD15 = 1.6   # samples/s/chip, derivation above
A100_BASELINE_DIT = 9.0    # samples/s/chip, derivation above
# SDXL-base 1024²: 350 TF/sample (50 × 7.0 TF) at 20% eager MFU → 0.178/s
A100_BASELINE_SDXL = 0.18
V5E_PEAK_TFLOPS = 197.0


def build_sd15_unet(dtype=jnp.bfloat16, tome_ratio: float = 0.0, freeu=None):
    """SD1.5 UNet per reference weights/stablediffusion/v1-inference.yaml.

    ``tome_ratio>0`` enables Token Merging at the 64x64 attention level
    (dmtpu/ops/tome.py; serving-only, params identical to the baseline);
    ``freeu`` takes the (b1, b2, s1, s2) scales (dmtpu/ops/freeu.py;
    serving-only quality knob, also param-free)."""
    from dmtpu.models.stablediffusion.unet import SDUNetModel

    model = SDUNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        use_spatial_transformer=True, transformer_depth=1, context_dim=768,
        legacy=False, torso_dtype=dtype, tome_ratio=tome_ratio, freeu=freeu)

    def init(rng, batch):
        x = jnp.zeros((batch, 64, 64, 4))
        t = jnp.zeros((batch,), jnp.int32)
        ctx = jnp.zeros((batch, 77, 768))
        return model.init(rng, x, t, ctx)

    def apply_fn(params, x, t, ctx):
        return model.apply(params, x, t, ctx)

    return model, init, apply_fn


def build_dit_xl2(dtype=jnp.bfloat16):
    """DiT-XL/2 at 256² (32×32 latents) per reference models/dit/model.py:332."""
    from dmtpu.models.dit import dit_model

    model = dit_model("DiT-XL/2", input_size=32, dtype=dtype)

    def init(rng, batch):
        x = jnp.zeros((batch, 32, 32, 4))
        t = jnp.zeros((batch,), jnp.int32)
        y = jnp.zeros((batch,), jnp.int32)
        return model.init(rng, x, t, y)

    def apply_fn(params, x, t, ctx):
        # ctx unused; class label fixed (conditioning cost is in the embed)
        return model.apply(params, x, t, jnp.zeros((x.shape[0],), jnp.int32))

    return model, init, apply_fn


def build_sdxl_unet(dtype=jnp.bfloat16):
    """SDXL-base UNet per reference weights/sdxl/sd_xl_base.yaml (2.57B):
    1024² → 128×128×4 latents, per-level transformer_depth [1,2,10],
    context 2048, 'sequential' vector conditioning (adm_in 2816)."""
    from dmtpu.models.stablediffusion.unet import SDUNetModel

    model = SDUNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2), channel_mult=(1, 2, 4),
        num_head_channels=64, use_spatial_transformer=True,
        transformer_depth=(1, 2, 10), context_dim=2048,
        num_classes="sequential", adm_in_channels=2816,
        use_linear_in_transformer=True, legacy=False, torso_dtype=dtype)

    def init(rng, batch):
        x = jnp.zeros((batch, 128, 128, 4))
        t = jnp.zeros((batch,), jnp.int32)
        ctx = jnp.zeros((batch, 77, 2048))
        y = jnp.zeros((batch, 2816))
        return model.init(rng, x, t, ctx, y)

    def apply_fn(params, x, t, ctx):
        y = jnp.zeros((x.shape[0], 2816), x.dtype)
        return model.apply(params, x, t, ctx, y)

    return model, init, apply_fn


def _time_sample_fn(sample, init, latent_hw: int, batch: int,
                    reps: int) -> Tuple[float, float]:
    """Shared timing scaffold: init params, warm-up compile, min-of-reps.

    One place owns the axon-transport timing discipline: a host transfer
    (``float(out.sum())``) per rep, because ``block_until_ready`` has been
    observed returning early on this transport.
    ``sample(params, noise, key) -> [B, H, W, C]`` must be jitted.
    """
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: init(r, batch))(rng)
    noise = jax.random.normal(rng, (batch, latent_hw, latent_hw, 4))
    float(sample(params, noise, rng).sum())  # compile + warm-up

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sample(params, noise, jax.random.fold_in(rng, i))
        float(out.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch / dt, dt


def time_ddim50(init, apply_fn, latent_hw: int, batch: int, steps: int = 50,
                reps: int = 5, ctx_dim: int = 768,
                sampler: str = "ddim") -> Tuple[float, float]:
    """Return (samples/sec, seconds/best-rep) for a scanned sampler loop.

    ``sampler``: "ddim", "dpmpp" (DPM-Solver++(2M) — the low-NFE serving
    configuration, steps=20 matches DDIM-50 quality in the literature) or
    "pfdiff" (PFDiff-1: same ``steps`` grid at ~steps/2 model calls).
    """
    from dmtpu.diffusions import DDIM, DPMSolverPP, PFDiffDDIM

    cls = {"ddim": DDIM, "dpmpp": DPMSolverPP, "pfdiff": PFDiffDDIM}[sampler]
    sampler = cls(total_steps=1000, respace_type="uniform", respace_steps=steps)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, ctx_dim))

    @jax.jit
    def sample(p, noise, key):
        return sampler.sample(lambda x, t, **kw: apply_fn(p, x, t, ctx), noise, key)

    return _time_sample_fn(sample, init, latent_hw, batch, reps)


def time_ddim50_deepcache(init, apply_fn_dc, latent_hw: int, batch: int,
                          steps: int = 50, reps: int = 5, ctx_dim: int = 768,
                          interval: int = 2, skip: int = 3) -> Tuple[float, float]:
    """DDIM-N sampling with DeepCache (full UNet every ``interval``-th step,
    shallow ``skip``-level slice otherwise — dmtpu/diffusions/deepcache.py).

    ``apply_fn_dc(p, x, t, ctx, dc_skip=..., dc_cached=...)`` is the raw
    DeepCache-aware UNet apply (benchmarks build it from SDUNetModel).
    """
    from dmtpu.diffusions import DDIM
    from dmtpu.diffusions.deepcache import deepcache_sample

    sampler = DDIM(total_steps=1000, respace_type="uniform", respace_steps=steps)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, ctx_dim))

    @jax.jit
    def sample(p, noise, key):
        def full_fn(x, t):
            return apply_fn_dc(p, x, t, ctx, dc_skip=skip)

        def shallow_fn(x, t, u):
            return apply_fn_dc(p, x, t, ctx, dc_skip=skip, dc_cached=u)[0]

        return deepcache_sample(sampler, full_fn, shallow_fn, noise, key,
                                interval=interval)

    return _time_sample_fn(sample, init, latent_hw, batch, reps)


def time_pfdiff_deepcache(init, apply_fn_dc, latent_hw: int, batch: int,
                          steps: int = 50, reps: int = 5, ctx_dim: int = 768,
                          interval: int = 2, skip: int = 3) -> Tuple[float, float]:
    """PFDiff-1 over the DDIM-``steps`` grid WITH DeepCache dispatch — the
    composed serving stack (~steps/2 model calls, 1/interval of them full)."""
    from dmtpu.diffusions import PFDiffDDIM
    from dmtpu.diffusions.deepcache import pfdiff_deepcache_sample

    sampler = PFDiffDDIM(total_steps=1000, respace_type="uniform",
                         respace_steps=steps)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, ctx_dim))

    @jax.jit
    def sample(p, noise, key):
        del key  # deterministic

        def full_fn(x, t):
            return apply_fn_dc(p, x, t, ctx, dc_skip=skip)

        def shallow_fn(x, t, u):
            return apply_fn_dc(p, x, t, ctx, dc_skip=skip, dc_cached=u)[0]

        return pfdiff_deepcache_sample(sampler, full_fn, shallow_fn, noise,
                                       interval=interval)

    return _time_sample_fn(sample, init, latent_hw, batch, reps)


def mfu(samples_per_sec: float, gflops_per_step: float, steps: int = 50,
        peak_tflops: float = V5E_PEAK_TFLOPS) -> float:
    return samples_per_sec * gflops_per_step * steps / (peak_tflops * 1e3)


if __name__ == "__main__":
    # Focused headline run (SD1.5 DDIM-50 sampling only, ~3 min warm) so a
    # dispatch A/B (e.g. env DMTPU_SMALL_D=1) doesn't need the full bench.py.
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dmtpu.utils.setup import setup_jax

    setup_jax()  # persistent compile cache — the A/B re-runs this twice
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16  # bench.py SD_BATCH
    tome = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0  # ToMe A/B knob
    _, init, apply_fn = build_sd15_unet(tome_ratio=tome)
    sps, dt = time_ddim50(init, apply_fn, latent_hw=64, batch=batch)
    print(json.dumps({
        "metric": "sd15_ddim50_samples_per_sec", "value": round(sps, 3),
        "batch": batch, "tome_ratio": tome,
        "mfu": round(mfu(sps, SD15_GFLOPS_PER_STEP), 3),
    }), flush=True)
