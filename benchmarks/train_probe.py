"""Round-3 probe: train-step feasibility + timing on the real chip.

Measures SD1.5 512-squared and DiT-XL/2 256-squared train steps (forward +
backward + optimizer) at several batch sizes.  Writes one JSON line per
configuration to stdout.  Run standalone (never concurrently with pytest —
the tunnel is single-user).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dmtpu.diffusions import DDPM  # noqa: E402
from dmtpu.parallel import TrainState, make_diffusion_loss_fn, make_train_step  # noqa: E402
from dmtpu.utils import optim as optim_lib  # noqa: E402

V5E_PEAK_TFLOPS = 197.0


def time_train_step(model_apply, init_fn, batch_shapes, tx, label, reps=4,
                    fwd_gflops=None, ema=False, ema_dtype=None):
    diffuser = DDPM(total_steps=1000)
    loss_fn = make_diffusion_loss_fn(diffuser, model_apply, total_steps=1000)
    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)

    rng = jax.random.PRNGKey(0)
    params = jax.jit(init_fn)(rng)
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    state = TrainState.create(params, tx, ema_decay=0.9999 if ema else None,
                              ema_dtype=ema_dtype)
    batch = {k: jax.random.normal(jax.random.fold_in(rng, i), shape)
             for i, (k, shape) in enumerate(batch_shapes.items())}
    bsz = batch["image"].shape[0]

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, rng)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out = {
        "label": label, "batch": bsz, "params_m": round(n_params / 1e6, 1),
        "compile_s": round(compile_s, 1), "step_s": round(dt, 4),
        "imgs_per_sec": round(bsz / dt, 3), "loss0": round(l0, 4),
        "all_times": [round(t, 4) for t in times],
    }
    if fwd_gflops:
        model_tf_per_img = 3.0 * fwd_gflops / 1e3  # fwd+bwd ~= 3x fwd (std MFU)
        out["train_mfu_v5e"] = round(
            (bsz / dt) * model_tf_per_img / V5E_PEAK_TFLOPS, 3)
    print(json.dumps(out), flush=True)
    return out


def sd15(batch, remat=True, ema=False, ema_dtype=None, tome_ratio=0.0):
    from northstar import SD15_GFLOPS_PER_STEP
    from dmtpu.models.stablediffusion.unet import SDUNetModel

    model = SDUNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        use_spatial_transformer=True, transformer_depth=1, context_dim=768,
        legacy=False, torso_dtype=jnp.bfloat16, use_checkpoint=remat,
        tome_ratio=tome_ratio)

    def init_fn(rng):
        return model.init(rng, jnp.zeros((1, 64, 64, 4)),
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)))

    def apply_fn(p, x, t, rngs=None, context=None, **kw):
        return model.apply(p, x, t, context)

    return time_train_step(
        apply_fn, init_fn,
        {"image": (batch, 64, 64, 4), "context": (batch, 77, 768)},
        optim_lib.adafactor(lr=1e-4),
        f"sd15_train_b{batch}"
        + (f"_remat-{remat}" if isinstance(remat, str)
           else ("" if remat else "_noremat"))
        + ("_ema" if ema else "") + ("16" if ema and ema_dtype else "")
        + (f"_tome{tome_ratio}" if tome_ratio else ""),
        fwd_gflops=SD15_GFLOPS_PER_STEP, ema=ema, ema_dtype=ema_dtype)


def sd15_lora(batch, rank=16, ema=True, remat=True):
    """LoRA fine-tune step: frozen base UNet as a jit argument, rank-r
    adapters trainable (dmtpu/models/lora.py), EMA over the adapters."""
    from northstar import SD15_GFLOPS_PER_STEP
    from dmtpu.models.lora import apply_lora, init_lora
    from dmtpu.models.stablediffusion.unet import SDUNetModel

    model = SDUNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        use_spatial_transformer=True, transformer_depth=1, context_dim=768,
        legacy=False, torso_dtype=jnp.bfloat16, use_checkpoint=remat)

    rng = jax.random.PRNGKey(0)
    base = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768))))(rng)
    lora0 = init_lora(base, jax.random.fold_in(rng, 7), rank=rank)

    diffuser = DDPM(total_steps=1000)

    def loss_fn(lora, batch_d, key, frozen):
        merged = apply_lora(frozen, lora, 1.0)

        def apply_fn(p, x, t, rngs=None, context=None, **kw):
            return model.apply(p, x, t, context)

        inner = make_diffusion_loss_fn(diffuser, apply_fn, total_steps=1000)
        return inner(merged, batch_d, key)

    tx = optim_lib.adamw(lr=1e-4)
    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0, n_extra_args=1)
    state = TrainState.create(lora0, tx, ema_decay=0.9999 if ema else None)
    n_tr = sum(int(p.size) for p in jax.tree.leaves(lora0))
    batch_d = {"image": jax.random.normal(rng, (batch, 64, 64, 4)),
               "context": jax.random.normal(jax.random.fold_in(rng, 1),
                                            (batch, 77, 768))}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_d, rng, base)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch_d, jax.random.fold_in(rng, i), base)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    model_tf_per_img = 3.0 * SD15_GFLOPS_PER_STEP / 1e3
    print(json.dumps({
        "label": f"sd15_lora_r{rank}_b{batch}" + ("_ema" if ema else "")
        + ("" if remat else "_noremat"),
        "batch": batch, "trainable_m": round(n_tr / 1e6, 2),
        "compile_s": round(compile_s, 1), "step_s": round(dt, 4),
        "imgs_per_sec": round(batch / dt, 3), "loss0": round(l0, 4),
        "train_mfu_v5e": round((batch / dt) * model_tf_per_img / V5E_PEAK_TFLOPS, 3),
        "all_times": [round(t, 4) for t in times],
    }), flush=True)


def sd15_conv_only(batch):
    """Ablation: the SD1.5 UNet with ALL transformers removed
    (attention_resolutions=()) — isolates the conv backbone's TRAINING MFU
    (dgrad/wgrad) to decompose the full-step gap.  Reports exact FLOPs from
    the compiled step's cost_analysis (includes remat recompute)."""
    from dmtpu.models.stablediffusion.unet import SDUNetModel

    model = SDUNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(), channel_mult=(1, 2, 4, 4), num_heads=8,
        use_spatial_transformer=True, transformer_depth=1, context_dim=768,
        legacy=False, torso_dtype=jnp.bfloat16, use_checkpoint=True)

    def apply_fn(p, x, t, rngs=None, context=None, **kw):
        return model.apply(p, x, t, context)

    tx = optim_lib.adafactor(lr=1e-4)
    loss_fn = make_diffusion_loss_fn(DDPM(total_steps=1000), apply_fn,
                                     total_steps=1000)
    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768))))(rng)
    state = TrainState.create(params, tx, ema_decay=None)
    batch_d = {"image": jax.random.normal(rng, (batch, 64, 64, 4)),
               "context": jax.random.normal(jax.random.fold_in(rng, 1),
                                            (batch, 77, 768))}
    jitted = jax.jit(step_fn)
    t0 = time.perf_counter()
    compiled = jitted.lower(state, batch_d, rng).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    state2, metrics = jitted(state, batch_d, rng)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state2, metrics = jitted(state2, batch_d, jax.random.fold_in(rng, i))
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "label": f"sd15_train_convonly_b{batch}", "batch": batch,
        "compile_s": round(compile_s, 1), "step_s": round(dt, 4),
        "imgs_per_sec": round(batch / dt, 3), "loss0": round(l0, 4),
        "cost_analysis_tflops_per_step": round(flops / 1e12, 3)
        if flops == flops else None,
        "hw_util": round(flops / 1e12 / dt / V5E_PEAK_TFLOPS, 3)
        if flops == flops else None,
        "all_times": [round(t, 4) for t in times],
    }), flush=True)


def dit(batch, opt="adamw_bf16mu", remat=True, size="DiT-XL/2"):
    from northstar import DIT_XL2_GFLOPS_PER_STEP
    from dmtpu.models.dit import dit_model

    model = dit_model(size, input_size=32, dtype=jnp.bfloat16,
                      use_checkpoint=remat, learn_sigma=False)

    def init_fn(rng):
        return model.init(rng, jnp.zeros((1, 32, 32, 4)),
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))

    def apply_fn(p, x, t, rngs=None, y=None, **kw):
        return model.apply(p, x, t, y)

    tx = (optim_lib.adamw(lr=1e-4, mu_dtype="bfloat16") if opt == "adamw_bf16mu"
          else optim_lib.adafactor(lr=1e-4))
    import numpy as np
    y = np.random.RandomState(0).randint(0, 1000, size=(batch,))
    diffuser = DDPM(total_steps=1000)
    loss_fn = make_diffusion_loss_fn(diffuser, apply_fn, total_steps=1000)
    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(init_fn)(rng)
    state = TrainState.create(params, tx, ema_decay=None)
    batch_d = {"image": jax.random.normal(rng, (batch, 32, 32, 4)),
               "y": jnp.asarray(y, jnp.int32)}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_d, rng)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch_d, jax.random.fold_in(rng, i))
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    if size == "DiT-XL/2":
        gflops = DIT_XL2_GFLOPS_PER_STEP
    else:
        # XLA-counted forward cost at batch 1, like the mmdit probe — the
        # size-class-fair MFU baseline (e.g. DiT-B/2 vs MMDiT-B/2)
        fwd = jax.jit(lambda p: model.apply(
            p, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32)))
        gflops = float(fwd.lower(params).compile()
                       .cost_analysis()["flops"]) / 1e9
    model_tf_per_img = 3.0 * gflops / 1e3
    print(json.dumps({
        "label": f"dit_train_{size.replace('/', '')}_b{batch}_{opt}"
        + (f"_remat-{remat}" if isinstance(remat, str)
           else ("" if remat else "_noremat")),
        "batch": batch,
        "compile_s": round(compile_s, 1), "step_s": round(dt, 4),
        "imgs_per_sec": round(batch / dt, 3), "loss0": round(l0, 4),
        "train_mfu_v5e": round((batch / dt) * model_tf_per_img / V5E_PEAK_TFLOPS, 3),
        "all_times": [round(t, 4) for t in times],
    }), flush=True)


def mmdit(batch, size="MMDiT-L/2", opt="adafactor", remat=True, ctx_len=77,
          bf16_params=False, qk_norm=True):
    """SD3-class MMDiT rectified-flow train step (256² latents: 32×32×4,
    T5-width context + CLIP-width pooled).  fwd FLOPs are XLA-counted via
    cost_analysis, so the MFU is honest for any size/ctx_len.

    Round-5 ablation axes: ``ctx_len=128`` pads the joint sequence to a
    lane-aligned 384; ``bf16_params`` stores torso params in bf16 (the
    L/2-on-16GB lever); ``qk_norm=False`` drops the per-block f32 RMSNorm
    islands to price them."""
    from dmtpu.diffusions import FlowMatching
    from dmtpu.models.mmdit import mmdit_model

    model = mmdit_model(size, input_size=32, in_channels=4,
                        context_dim=4096, pooled_dim=2048,
                        dtype=jnp.bfloat16, use_checkpoint=remat,
                        qk_norm=qk_norm, prefer_flash=True,
                        param_dtype=jnp.bfloat16 if bf16_params else jnp.float32)

    def init_fn(rng):
        y0 = {"context": jnp.zeros((1, ctx_len, 4096)),
              "pooled": jnp.zeros((1, 2048))}
        return model.init(rng, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)), y0)

    def apply_fn(p, x, t, rngs=None, context=None, pooled=None, **kw):
        drop = None if rngs is None else rngs.get("dropout")
        return model.apply(p, x, t, {"context": context, "pooled": pooled},
                           train=True, force_drop_rng=drop)

    tx = (optim_lib.adafactor(lr=1e-4) if opt == "adafactor"
          else optim_lib.adamw(lr=1e-4, mu_dtype="bfloat16"))
    diffuser = FlowMatching(total_steps=1000)
    loss_fn = make_diffusion_loss_fn(diffuser, apply_fn, total_steps=1000)
    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(init_fn)(rng)
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))

    # XLA-counted forward cost at batch 1 (2 flops/MAC, like northstar's)
    y1 = {"context": jnp.zeros((1, ctx_len, 4096)), "pooled": jnp.zeros((1, 2048))}
    fwd = jax.jit(lambda p: model.apply(p, jnp.zeros((1, 32, 32, 4)),
                                        jnp.zeros((1,)), y1))
    cost = fwd.lower(params).compile().cost_analysis()
    fwd_gflops = float(cost["flops"]) / 1e9

    state = TrainState.create(params, tx, ema_decay=None)
    batch_d = {"image": jax.random.normal(rng, (batch, 32, 32, 4)),
               "context": jax.random.normal(rng, (batch, ctx_len, 4096)),
               "pooled": jax.random.normal(rng, (batch, 2048))}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_d, rng)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch_d, jax.random.fold_in(rng, i))
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    model_tf_per_img = 3.0 * fwd_gflops / 1e3
    print(json.dumps({
        "label": f"mmdit_train_{size.replace('/', '')}_b{batch}_{opt}"
        + (f"_remat-{remat}" if isinstance(remat, str)
           else ("" if remat else "_noremat"))
        + (f"_ctx{ctx_len}" if ctx_len != 77 else "")
        + ("_bf16p" if bf16_params else "")
        + ("" if qk_norm else "_noqk"),
        "batch": batch, "params_m": round(n_params / 1e6, 1),
        "fwd_gflops": round(fwd_gflops, 1),
        "compile_s": round(compile_s, 1), "step_s": round(dt, 4),
        "imgs_per_sec": round(batch / dt, 3), "loss0": round(l0, 4),
        "train_mfu_v5e": round((batch / dt) * model_tf_per_img / V5E_PEAK_TFLOPS, 3),
        "all_times": [round(t, 4) for t in times],
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sd4"):
        sd15(4)
    if which == "sd8nr":
        sd15(8, remat=False)
    if which == "sd16nr":
        sd15(16, remat=False)
    if which in ("all", "sd8"):
        sd15(8)
    if which in ("all", "sd16"):
        sd15(16)
    if which in ("all", "dit16"):
        dit(16)
    if which in ("all", "dit32"):
        dit(32)
    if which == "dit32nr":
        dit(32, remat=False)
    if which == "dit16nr":
        dit(16, remat=False)
    if which == "dit64":
        dit(64)
    if which == "sd12nr":
        sd15(12, remat=False)
    if which == "dit32nraf":
        dit(32, opt="adafactor", remat=False)
    if which == "sd16nr2":
        sd15(16, remat=False)
    if which == "sdconv16":
        sd15_conv_only(16)
    if which == "sd8ema":
        sd15(8, remat=True, ema=True)
    if which == "dit48nraf":
        dit(48, opt="adafactor", remat=False)
    if which == "sd16attn":   # round 4: save-attn-outputs selective remat
        sd15(16, remat="attn")
    if which == "sd16tome":   # round 4: ToMe r=0.5 training (differentiable)
        sd15(16, tome_ratio=0.5)
    if which == "sd16attntome":
        sd15(16, remat="attn", tome_ratio=0.5)
    if which == "sd16nrtome":  # round 5: ToMe halves the S=4096 activations
        sd15(16, remat=False, tome_ratio=0.5)  # (plain b16 noremat OOMs)
    if which == "sd24tome":
        sd15(24, tome_ratio=0.5)
    if which == "sd32tome":
        sd15(32, tome_ratio=0.5)
    if which == "sd48tome":
        sd15(48, tome_ratio=0.5)
    if which == "sd24":   # round 5: plain-train batch sweep post-flash_small_d
        sd15(24)
    if which == "sd32":
        sd15(32)
    if which == "sd24attntome":
        sd15(24, remat="attn", tome_ratio=0.5)
    if which == "sd8attn":
        sd15(8, remat="attn")
    if which == "sd16attnema":
        sd15(16, remat="attn", ema=True, ema_dtype="bfloat16")
    if which == "lora8":
        sd15_lora(8)
    if which == "lora16":
        sd15_lora(16)
    if which == "lora8nr":
        sd15_lora(8, remat=False)
    if which == "lora16nr":
        sd15_lora(16, remat=False)
    if which == "lora12nr":
        sd15_lora(12, remat=False)
    if which == "sd8ema16":
        sd15(8, remat=True, ema=True, ema_dtype="bfloat16")
    if which == "sd8nrema16":
        sd15(8, remat=False, ema=True, ema_dtype="bfloat16")
    if which == "sd16ema16":
        sd15(16, remat=True, ema=True, ema_dtype="bfloat16")
    if which == "dit32dots":
        dit(32, opt="adafactor", remat="dots")
    if which == "dit48dots":
        dit(48, opt="adafactor", remat="dots")
    if which == "dit64dots":
        dit(64, opt="adafactor", remat="dots")
    if which == "sd16dots":
        sd15(16, remat="dots")
    if which == "sd16dotsema16":
        sd15(16, remat="dots", ema=True, ema_dtype="bfloat16")
    if which == "sd24dots":
        sd15(24, remat="dots")
    # round 4: SD3-class MMDiT rectified-flow training
    if which == "mmditb32":
        mmdit(32, size="MMDiT-B/2")
    if which == "mmditb32nr":
        mmdit(32, size="MMDiT-B/2", remat=False)
    if which == "mmditl8":
        mmdit(8, size="MMDiT-L/2")
    if which == "mmditl16":
        mmdit(16, size="MMDiT-L/2")
    if which == "mmditl32":
        mmdit(32, size="MMDiT-L/2")
    # round 5: MMDiT MFU decomposition + L/2-on-16GB (VERDICT r4 #1)
    if which == "mmditb64nr":
        mmdit(64, size="MMDiT-B/2", remat=False)
    if which == "mmditb128nr":
        mmdit(128, size="MMDiT-B/2", remat=False)
    if which == "mmditb256nr":
        mmdit(256, size="MMDiT-B/2", remat=False)
    if which == "mmditb32nrctx128":
        mmdit(32, size="MMDiT-B/2", remat=False, ctx_len=128)
    if which == "mmditb128nrctx128":
        mmdit(128, size="MMDiT-B/2", remat=False, ctx_len=128)
    if which == "mmditb32nradamw":
        mmdit(32, size="MMDiT-B/2", remat=False, opt="adamw_bf16mu")
    if which == "mmditb32nrnoqk":
        mmdit(32, size="MMDiT-B/2", remat=False, qk_norm=False)
    if which == "mmditb128nrnoqk":
        # qk-norm price at the measured-best batch (b128)
        mmdit(128, size="MMDiT-B/2", remat=False, qk_norm=False)
    if which == "mmditb128nrbf16p":
        # bf16 torso params at the best batch: halves param/grad HBM traffic
        # in the optimizer epilogue — a possible MFU lever, not just a
        # memory one
        mmdit(128, size="MMDiT-B/2", remat=False, bf16_params=True)
    if which == "mmditb256nrbf16p":
        mmdit(256, size="MMDiT-B/2", remat=False, bf16_params=True)
    if which == "mmditl8bf16p":
        mmdit(8, size="MMDiT-L/2", bf16_params=True)
    if which == "mmditl16bf16p":
        mmdit(16, size="MMDiT-L/2", bf16_params=True)
    if which == "mmditl32bf16p":
        mmdit(32, size="MMDiT-L/2", bf16_params=True)
    if which == "mmditl32bf16pattn":
        mmdit(32, size="MMDiT-L/2", bf16_params=True, remat="attn")
    if which == "mmditl64bf16p":
        mmdit(64, size="MMDiT-L/2", bf16_params=True)
    if which == "ditb128nr":
        # size-class-fair MFU control for MMDiT-B/2 (same 768-wide, depth-12
        # class; adafactor like the mmdit probes): is the MMDiT-vs-DiT MFU
        # gap the two-stream architecture or just the model size?
        dit(128, size="DiT-B/2", remat=False, opt="adafactor")
    if which == "ditb32nr":
        dit(32, size="DiT-B/2", remat=False, opt="adafactor")
