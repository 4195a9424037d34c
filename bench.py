"""Headline benchmark: the BASELINE.json north-star metrics on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Workloads (random-init weights; DDIM-50 scanned sampler loop; bf16 torso with
f32 GroupNorm/softmax islands):
  - SD1.5 UNet 512² (64×64×4 latents), batch 16 — headline metric.
  - DiT-XL/2 256² (32×32×4 latents), batch 32 — reported in "extra".
  - SDXL-base 1024² (128×128×4 latents), batch 1 — reported in "extra".
  - TRAIN steps (fwd+bwd+optimizer, remat+flash backward): SD1.5 512² with
    adafactor and DiT-XL/2 256² with AdamW(bf16 mu) — "extra",
    benchmarks/train_northstar.py.

``vs_baseline`` divides by a documented A100 estimate per model — the
derivation (XLA-counted FLOPs × published-peak × typical eager-inference MFU)
lives in benchmarks/northstar.py's module docstring.  MFU on this chip
(v5e, 197 TFLOPS bf16) is reported for both.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))


def _wait_for_tpu(tries: int = 3, sleep_s: int = 45) -> bool:
    """Probe the TPU in a THROWAWAY subprocess before committing this
    process's backend.  The axon tunnel wedges transiently (it recovers
    ~2 min after a wedging client exits — round-3's bench died in backend
    init exactly this way); a bounded retry turns that into a slow start
    instead of a red artifact.  Each probe process exits fully, releasing
    the single-user tunnel for the next attempt."""
    probe = ("import jax, jax.numpy as jnp; jax.devices(); "
             "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))")
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=150)
            if r.returncode == 0:
                return True
            tail = (r.stderr or r.stdout or b"").decode(errors="replace")[-300:]
            print(f"bench: TPU probe {i + 1}/{tries} rc={r.returncode}: {tail}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench: TPU probe {i + 1}/{tries} hung (tunnel wedged)",
                  file=sys.stderr, flush=True)
        if i + 1 < tries:
            time.sleep(sleep_s)
    return False


if not _wait_for_tpu():
    print("bench: TPU unavailable after retries — axon tunnel wedged "
          "(environment); see stderr probes above", file=sys.stderr, flush=True)
    sys.exit(1)

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

from northstar import (  # noqa: E402
    _time_sample_fn,
    A100_BASELINE_DIT,
    A100_BASELINE_SD15,
    A100_BASELINE_SDXL,
    DIT_XL2_GFLOPS_PER_STEP,
    SD15_GFLOPS_PER_STEP,
    SDXL_GFLOPS_PER_STEP,
    build_dit_xl2,
    build_sd15_unet,
    build_sdxl_unet,
    mfu,
    time_ddim50,
    time_ddim50_deepcache,
    time_pfdiff_deepcache,
)

SD_BATCH = 16
DIT_BATCH = 32
SDXL_BATCH = 1
SD_TRAIN_BATCH = 16
SD_TRAIN_TOME_BATCH = 32  # ToMe halves level-0 activations; b32 fits + wins
DIT_TRAIN_BATCH = 32
MMDIT_SAMPLE_BATCH = 32  # 2B-batched CFG doubles the model batch to 64


def main():
    # The headline workload is strict (a failure should fail the bench); the
    # extras are fail-soft so one OOM/compile issue on a different machine
    # cannot turn the whole benchmark artifact into an empty file.
    sd_model, sd_init, sd_apply = build_sd15_unet()
    sd_sps, _ = time_ddim50(sd_init, sd_apply, latent_hw=64, batch=SD_BATCH)

    extra = {
        "sd15_mfu_v5e": round(mfu(sd_sps, SD15_GFLOPS_PER_STEP), 3),
        "sd15_batch": SD_BATCH,
        "a100_baselines": {"sd15": A100_BASELINE_SD15, "dit_xl2": A100_BASELINE_DIT,
                           "sdxl": A100_BASELINE_SDXL},
    }

    # Wall-clock budget: with a cold compile cache (e.g. the tunnel only
    # recovered at driver time) the extras could outlive the driver's
    # timeout and the process would die BEFORE printing the payload line.
    # The gate only skips extras that have NOT started — an extra already
    # running can still overshoot, so the protection holds when
    # driver_timeout > budget + max(single-extra duration); the 1800 s
    # default leaves that headroom against the slowest observed extra
    # (DiT train cold compile ~14 min).  Skipped extras are recorded.
    bench_t0 = time.monotonic()
    budget_s = float(os.environ.get("DMTPU_BENCH_BUDGET_S", "1800"))

    def soft(label, fn):
        if time.monotonic() - bench_t0 > budget_s:
            extra.setdefault("skipped_over_budget", []).append(label)
            return
        try:
            extra.update(fn())
        except Exception as e:  # noqa: BLE001 — report, don't die
            extra[f"{label}_error"] = f"{type(e).__name__}: {e}"[:200]

    def dpmpp():
        # low-NFE serving config: DPM-Solver++(2M) 20 steps ~ DDIM-50 quality
        sps, _ = time_ddim50(sd_init, sd_apply, latent_hw=64,
                             batch=SD_BATCH, steps=20, sampler="dpmpp")
        return {"sd15_dpmpp20_samples_per_sec": round(sps, 3)}

    def pfdiff():
        # PFDiff-1 serving config (round 4): the DDIM-50 grid at 26 NFE
        # (dmtpu/diffusions/pfdiff.py — past-score springboard + future score)
        sps, _ = time_ddim50(sd_init, sd_apply, latent_hw=64,
                             batch=SD_BATCH, steps=50, sampler="pfdiff")
        return {"sd15_pfdiff_grid50_samples_per_sec": round(sps, 3)}

    def deepcache():
        # DeepCache serving config (round 4): full UNet every 2nd DDIM-50
        # step, shallow 3-level slice otherwise (dmtpu/diffusions/deepcache.py)
        sps, _ = time_ddim50_deepcache(sd_init, sd_model.apply, latent_hw=64,
                                       batch=SD_BATCH, interval=2, skip=3)
        return {"sd15_deepcache_n2s3_samples_per_sec": round(sps, 3)}

    def dit():
        _, dit_init, dit_apply = build_dit_xl2()
        sps, _ = time_ddim50(dit_init, dit_apply, latent_hw=32, batch=DIT_BATCH)
        return {
            "dit_xl2_256_samples_per_sec": round(sps, 3),
            "dit_xl2_vs_a100_baseline": round(sps / A100_BASELINE_DIT, 3),
            "dit_xl2_mfu_v5e": round(mfu(sps, DIT_XL2_GFLOPS_PER_STEP), 3),
            "dit_batch": DIT_BATCH,
        }

    def sdxl():
        _, sdxl_init, sdxl_apply = build_sdxl_unet()
        sps, _ = time_ddim50(sdxl_init, sdxl_apply, latent_hw=128,
                             batch=SDXL_BATCH, ctx_dim=2048)
        return {
            "sdxl_1024_samples_per_sec": round(sps, 3),
            "sdxl_vs_a100_baseline": round(sps / A100_BASELINE_SDXL, 3),
            "sdxl_mfu_v5e": round(mfu(sps, SDXL_GFLOPS_PER_STEP), 3),
        }

    from train_northstar import (
        dit_train_metrics,
        mmdit_train_metrics,
        sd15_lora_train_metrics,
        sd15_train_metrics,
    )

    def pfdiff_deepcache():
        # composed serving stack: PFDiff-1 on the DDIM-50 grid (26 calls)
        # x DeepCache (every 2nd call full, shallow otherwise)
        sps, _ = time_pfdiff_deepcache(sd_init, sd_model.apply, latent_hw=64,
                                       batch=SD_BATCH, interval=2, skip=3)
        return {"sd15_pfdiff_deepcache_samples_per_sec": round(sps, 3)}

    # ToMe model built once, measured by two SEPARATE fail-soft extras so a
    # failure in the composed stack can't discard the plain ToMe number
    tome_built = build_sd15_unet(tome_ratio=0.5)

    def cfg_serving():
        # production text2img shape: DDIM-50 with CFG (one 2B-batched call
        # per step) at s=7.5, and the same with limited-interval guidance
        # (t in (180, 730] guided; one B call elsewhere) — the interval
        # lever's end-to-end win on chip
        import jax
        import jax.numpy as jnp

        from dmtpu.diffusions import DDIMCFG

        b = SD_BATCH // 2  # 2B-batched CFG doubles the model batch
        ctx = jax.random.normal(jax.random.PRNGKey(3), (b, 77, 768))
        uctx = jnp.zeros_like(ctx)
        out = {}
        for label, extra_kw in (("sd15_cfg50", {}),
                                ("sd15_cfg50_interval",
                                 {"guidance_interval": (180.0, 730.0)})):
            diffuser = DDIMCFG(total_steps=1000, respace_type="uniform",
                               respace_steps=50, guidance_scale=7.5,
                               cond_kwarg="text_embed", **extra_kw)

            @jax.jit
            def sample(p, noise, key):
                return diffuser.sample(  # noqa: B023 — consumed immediately
                    lambda x, t, text_embed=None, **kw: sd_apply(p, x, t, text_embed),
                    noise, key, uncond_conditioning=uctx,
                    model_kwargs=dict(text_embed=ctx))

            sps, _ = _time_sample_fn(sample, sd_init, 64, b, reps=5)
            out[f"{label}_samples_per_sec"] = round(sps, 3)
        return out

    def mmdit_sample():
        # the flagship family's SERVING figure (its train figure is
        # mmdit_train_*): MMDiT-B/2 256²-latent text2img, FlowDPM-20
        # (DPM-Solver++(2M) in the rectified-flow parameterisation,
        # dmtpu/diffusions/flow_dpm.py) under CFG s=4 as ONE 2B-batched
        # call per step — the exact path scripts/sample_mmdit.py ships.
        # MFU uses XLA-counted forward FLOPs (cost_analysis), x2 for CFG.
        import jax
        import jax.numpy as jnp

        from dmtpu.diffusions import FlowDPMSolverCFG
        from dmtpu.models.mmdit import mmdit_model

        steps, b = 20, MMDIT_SAMPLE_BATCH
        model = mmdit_model("MMDiT-B/2", input_size=32, in_channels=4,
                            context_dim=4096, pooled_dim=2048,
                            dtype=jnp.bfloat16)
        ctx_len = 77
        y = {"context": jax.random.normal(jax.random.PRNGKey(4),
                                          (b, ctx_len, 4096)),
             "pooled": jax.random.normal(jax.random.PRNGKey(5), (b, 2048))}

        def init(rng, batch):
            y1 = {"context": jnp.zeros((1, ctx_len, 4096)),
                  "pooled": jnp.zeros((1, 2048))}
            return model.init(rng, jnp.zeros((1, 32, 32, 4)),
                              jnp.zeros((1,)), y1)

        diffuser = FlowDPMSolverCFG(guidance_scale=4.0, total_steps=1000,
                                    respace_steps=steps)
        null_y = model.null_conditioning(b, ctx_len)

        @jax.jit
        def sample(p, noise, key):
            return diffuser.sample(
                lambda x, t, y=None, **kw: model.apply(p, x, t, y),
                noise, key, uncond_conditioning=null_y, model_kwargs={"y": y})

        sps, _ = _time_sample_fn(sample, init, 32, b, reps=5)
        # XLA-counted fwd GFLOPs at batch 1 (honest for this ctx/size)
        params = jax.jit(init)(jax.random.PRNGKey(0), 1)
        y1 = {"context": jnp.zeros((1, ctx_len, 4096)),
              "pooled": jnp.zeros((1, 2048))}
        fwd = jax.jit(lambda p: model.apply(p, jnp.zeros((1, 32, 32, 4)),
                                            jnp.zeros((1,)), y1))
        gf = float(fwd.lower(params).compile().cost_analysis()["flops"]) / 1e9
        return {
            "mmdit_sample_samples_per_sec": round(sps, 3),
            "mmdit_sample_batch": b,
            "mmdit_sample_nfe": steps,
            "mmdit_sample_mfu_v5e": round(mfu(sps, 2 * gf, steps=steps), 3),
            "mmdit_sample_config": "MMDiT-B/2 flowdpm20 cfg4.0 2B-batched",
        }

    def tome():
        # Token Merging ratio 0.5 at the 64x64 level (dmtpu/ops/tome.py):
        # straight DDIM-50, cheaper model calls (params identical)
        _, tm_init, tm_apply = tome_built
        sps, _ = time_ddim50(tm_init, tm_apply, latent_hw=64, batch=SD_BATCH)
        return {"sd15_tome50_samples_per_sec": round(sps, 3)}

    def tome_stack():
        # full serving stack: ToMe x PFDiff-1 grid x DeepCache
        tm, tm_init, _ = tome_built
        sps, _ = time_pfdiff_deepcache(tm_init, tm.apply, latent_hw=64,
                                       batch=SD_BATCH, interval=2, skip=3)
        return {"sd15_tome_pfdiff_deepcache_samples_per_sec": round(sps, 3)}

    def cfg_stack():
        # the realistic text2img serving figure (VERDICT r4 #2): the MAX
        # composed stack sample_sd.py ships and tests — ToMe 0.5 x
        # FreeU(sd15) x PFDiff-1 (DDIM-50 grid, 26 NFE) x DeepCache(2,3),
        # under CFG s=7.5 as ONE 2B-batched call per model evaluation with
        # the eps-combine in the deepcache seam (scripts/sample_sd.py's
        # deepcache branch; interval-CFG is rejected with deepcache there,
        # so this is the full composable set)
        import jax
        import jax.numpy as jnp

        from dmtpu.diffusions import PFDiffDDIM
        from dmtpu.diffusions.deepcache import pfdiff_deepcache_sample
        from dmtpu.ops.freeu import SD15_DEFAULTS

        stk, stk_init, _ = build_sd15_unet(tome_ratio=0.5, freeu=SD15_DEFAULTS)
        b = SD_BATCH // 2  # 2B-batched CFG doubles the model batch
        s = 7.5
        diffuser = PFDiffDDIM(total_steps=1000, respace_type="uniform",
                              respace_steps=50)
        ctx = jax.random.normal(jax.random.PRNGKey(3), (b, 77, 768))
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)])

        def cfg_combine(out2, xc, c):
            oc, ou = jnp.split(out2, 2, axis=0)
            eps_c = diffuser.predict(oc, xc, c)["pred_eps"]
            eps_u = diffuser.predict(ou, xc, c)["pred_eps"]
            return (1.0 - s) * eps_u + s * eps_c

        @jax.jit
        def sample(p, noise, key):
            del key  # PFDiff is deterministic

            def raw_out(x, t, dc_kw):
                return stk.apply(p, jnp.concatenate([x, x]),
                                 jnp.concatenate([t, t]), ctx2, **dc_kw)

            def full_fn(x, t):
                return raw_out(x, t, dict(dc_skip=3))

            def shallow_fn(x, t, u):
                return raw_out(x, t, dict(dc_skip=3, dc_cached=u))[0]

            return pfdiff_deepcache_sample(diffuser, full_fn, shallow_fn,
                                           noise, interval=2,
                                           eps_fn=cfg_combine)

        sps, _ = _time_sample_fn(sample, stk_init, 64, b, reps=5)
        return {"sd15_cfg_stack_samples_per_sec": round(sps, 3),
                "sd15_cfg_stack": "tome0.5+freeu+pfdiff+deepcache23+cfg7.5"}

    soft("sd15_dpmpp", dpmpp)
    soft("sd15_pfdiff", pfdiff)
    soft("sd15_deepcache", deepcache)
    soft("sd15_pfdiff_deepcache", pfdiff_deepcache)
    soft("sd15_tome", tome)
    soft("sd15_tome_stack", tome_stack)
    soft("sd15_cfg_serving", cfg_serving)
    soft("sd15_cfg_stack", cfg_stack)
    soft("dit", dit)
    soft("sdxl", sdxl)
    # sd15_train_tome50 is the measured-best SD train config (round 5:
    # ToMe x flash_small_d compose at 31.75 img/s b16 = 38.1% MFU); the
    # plain variant stays as the like-for-like reference-config number
    soft("sd15_train", lambda: sd15_train_metrics(batch=SD_TRAIN_BATCH))
    # ToMe halves the S=4096 activations, so the composed config trains at a
    # larger batch than plain SD (round-5 sweep: b16 38.1% / b24 38.4% /
    # b32 39.1% MFU; noremat b16 33.8% — remat+b32 is the measured best)
    soft("sd15_train_tome", lambda: sd15_train_metrics(batch=SD_TRAIN_TOME_BATCH,
                                                       tome_ratio=0.5))
    soft("sd15_lora_train", sd15_lora_train_metrics)
    soft("dit_train", lambda: dit_train_metrics(batch=DIT_TRAIN_BATCH))
    soft("mmdit_train", mmdit_train_metrics)
    soft("mmdit_sample", mmdit_sample)

    payload = {
        "metric": "DDIM-50 SD1.5 512x512 sampling throughput",
        "value": round(sd_sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sd_sps / A100_BASELINE_SD15, 3),
        "extra": extra,
    }

    # Regression guard vs the most recent green driver artifact (fail-soft:
    # the guard annotates, it must never break the bench line itself).
    # cheap and must never be budget-skipped: run outside soft()'s gate
    try:
        from regression import find_regressions, load_prior_bench
        prior = load_prior_bench(os.path.dirname(os.path.abspath(__file__)))
        regs = find_regressions(payload, prior)
        if regs:
            extra["regressions"] = regs
    except Exception as e:  # noqa: BLE001 — report, don't die
        extra["regression_guard_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
