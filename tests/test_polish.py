"""Round-2 polish items: config targets, LR schedules, conditioner guard,
renoise-row scrubbing."""
import numpy as np
import pytest

import jax

CPU = jax.devices("cpu")[0]


def test_ddpm_cfg_cifar10_config_instantiates():
    """reference configs/ddpm_cfg_cifar10.yaml equivalent, with the stale
    ``diffusions.cfg.ddpm_cfg.DDPMCFG`` target corrected (SURVEY.md §5)."""
    import os

    from dmtpu.diffusions import DDPMCFG
    from dmtpu.models import UNetCategorialAdaGN
    from dmtpu.utils.config import instantiate_from_config, load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(repo, "configs", "ddpm_cfg_cifar10.yaml"))
    assert isinstance(instantiate_from_config(conf.model), UNetCategorialAdaGN)
    assert isinstance(instantiate_from_config(conf.diffusion), DDPMCFG)
    assert conf.train.p_uncond == 0.2


def test_lr_fn_constant_and_schedule():
    from dmtpu.utils.optim import lr_fn

    assert lr_fn({"params": {"lr": 3e-4}})(123) == pytest.approx(3e-4)
    sched = {"params": {"lr": {"target": "optax.cosine_decay_schedule",
                               "params": {"init_value": 1e-3, "decay_steps": 100}}}}
    f = lr_fn(sched)
    assert f(0) == pytest.approx(1e-3, rel=1e-5)
    assert f(50) == pytest.approx(5e-4, rel=1e-5)
    assert f(100) == pytest.approx(0.0, abs=1e-9)


def test_optimizer_accepts_schedule_config():
    import jax.numpy as jnp

    from dmtpu.utils.config import instantiate_from_config

    tx = instantiate_from_config({
        "target": "torch.optim.Adam",
        "params": {"lr": {"target": "optax.cosine_decay_schedule",
                          "params": {"init_value": 1e-3, "decay_steps": 10}}}})
    with jax.default_device(CPU):
        p = {"w": jnp.ones(3)}
        state = tx.init(p)
        updates, _ = tx.update({"w": jnp.ones(3)}, state, p)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_sdxl_conditioner_rejects_nonstandard_emb_models():
    from dmtpu.models.sdxl import SDXLConditioner

    good = [
        {"target": "models.sdxl.conditioner.FrozenCLIPEmbedder"},
        {"target": "models.sdxl.conditioner.FrozenOpenCLIPEmbedder2"},
        {"target": "models.sdxl.conditioner.ConcatTimestepEmbedderND",
         "params": {"outdim": 256}},
        {"target": "models.sdxl.conditioner.ConcatTimestepEmbedderND",
         "params": {"outdim": 256}},
        {"target": "models.sdxl.conditioner.ConcatTimestepEmbedderND",
         "params": {"outdim": 256}},
    ]
    SDXLConditioner(emb_models=good)  # standard base composition: fine
    with pytest.raises(ValueError, match="5-embedder"):
        SDXLConditioner(emb_models=good[:2])  # missing size embedders
    with pytest.raises(ValueError, match="5-embedder"):
        SDXLConditioner(emb_models=[{"target": "x.y.SomethingElse"}] + good[1:])


def test_resample_tape_scrubs_only_renoise_rows():
    """Renoise rows may carry non-finite placeholders (scrubbed to 0); a
    non-finite coefficient on a denoise row must raise."""
    from dmtpu.diffusions.guidance.mask_guidance import MaskGuidance

    with jax.default_device(CPU):
        g = MaskGuidance(total_steps=50, respace_type="uniform", respace_steps=10)
        tape = g.resample_tape(resample_r=3, resample_j=2)
    for k, v in tape.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), k
    denoise = tape["is_denoise"].astype(bool)
    assert denoise.any() and (~denoise).any()  # both row kinds exercised


def test_lr_fn_layouts():
    """lr_fn honours lr / learning_rate and reports NaN (not a plausible
    default) for unknown optimizer-config layouts."""
    import math

    from dmtpu.utils.optim import lr_fn

    assert lr_fn({"params": {"lr": 2e-4}})(0) == 2e-4
    assert lr_fn({"params": {"learning_rate": 3e-4}})(0) == 3e-4
    # known factories default to 1e-3 when lr is omitted
    assert lr_fn({"target": "torch.optim.Adam", "params": {"weight_decay": 0.01}})(0) == 1e-3
    assert lr_fn({"target": "utils.optim.adamw", "params": {}})(0) == 1e-3
    # unknown layout: NaN, not a plausible-looking constant
    assert math.isnan(lr_fn({"target": "optax.adam", "params": {"alpha": 0.1}})(0))


def test_get_logger_second_run_gets_fresh_file(tmp_path):
    """Scripts invoked twice in ONE process (resume runs, the test suite)
    must each get a working FileHandler — the name-cached logger used to
    return the FIRST run's handler and silently drop the second log file."""
    from dmtpu.utils.logger import get_logger

    f1, f2 = str(tmp_path / "a.log"), str(tmp_path / "b.log")
    get_logger(log_file=f1).info("first-run-line")
    get_logger(log_file=f2).info("second-run-line")
    assert "first-run-line" in open(f1).read()
    assert "second-run-line" in open(f2).read()
    # same-file repeat call still reuses the cached logger (no handler pileup)
    lg = get_logger(log_file=f2)
    assert sum(1 for h in lg.handlers) == 2  # one stream + one file


def test_all_shipped_configs_instantiate():
    """Config-rot guard: every configs/*.yaml's model / diffusion / optimizer
    targets resolve and construct (module objects only — no params), and the
    train block carries the keys the scripts read."""
    import glob
    import os

    from dmtpu.utils.config import instantiate_from_config, load_config
    from dmtpu.utils.optim import lr_fn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert len(paths) >= 7
    for p in paths:
        conf = load_config(p)
        assert instantiate_from_config(conf.model) is not None, p
        assert instantiate_from_config(conf.diffusion) is not None, p
        tr = conf.train
        assert instantiate_from_config(tr.optim) is not None, p
        assert float(lr_fn(tr.optim)(0)) == float(lr_fn(tr.optim)(0)), p  # not NaN
        for key in ("n_steps", "batch_size", "ema_decay", "print_freq",
                    "save_freq", "clip_grad_norm"):
            assert key in tr, (p, key)
        if "ema_dtype" in tr and tr.ema_dtype is not None:
            import jax.numpy as jnp

            jnp.dtype(tr.ema_dtype)  # resolvable dtype string


def test_get_logger_no_file_request_drops_old_file_handler(tmp_path):
    """A want-None call (no log_file, or non-main) after a file run must not
    keep appending to the previous run's file."""
    import logging

    from dmtpu.utils.logger import get_logger

    f1 = str(tmp_path / "a.log")
    get_logger(log_file=f1).info("first")
    lg = get_logger()  # no file requested
    assert not any(isinstance(h, logging.FileHandler) for h in lg.handlers)
    lg.info("should-not-reach-file")
    assert "should-not-reach-file" not in open(f1).read()


def test_dit_unconditional_requires_null_row():
    """y=None with class_dropout_prob=0 must raise (the embedding table has
    no null row; XLA would silently clamp to the last real class)."""
    import jax
    import jax.numpy as jnp

    from dmtpu.models.dit import dit_model

    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    m0 = dit_model("DiT-S/2", input_size=8, num_classes=10,
                   class_dropout_prob=0.0)
    with pytest.raises(ValueError, match="null-label row"):
        m0.init(jax.random.PRNGKey(0), x, t, None)
    # with dropout configured the null row exists and y=None works
    m1 = dit_model("DiT-S/2", input_size=8, num_classes=10,
                   class_dropout_prob=0.1)
    p = m1.init(jax.random.PRNGKey(0), x, t, None)
    assert jnp.all(jnp.isfinite(m1.apply(p, x, t, None)))


def test_adafactor_weight_decay_is_decoupled():
    """weight_decay must be optax.adafactor's native decoupled form — NOT
    add_decayed_weights chained before it (which would distort the factored
    second-moment statistics and be rescaled by the update clipping)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dmtpu.utils.optim import adafactor

    params = {"w": jnp.full((4, 4), 2.0)}
    grads = {"w": jnp.full((4, 4), 0.1)}
    tx = adafactor(lr=1e-3, weight_decay=0.01)
    ref = optax.adafactor(learning_rate=1e-3, weight_decay_rate=0.01,
                          multiply_by_parameter_scale=False,
                          dtype_momentum=jnp.bfloat16)
    u, _ = tx.update(grads, tx.init(params), params)
    u_ref, _ = ref.update(grads, ref.init(params), params)
    assert float(jnp.abs(u["w"] - u_ref["w"]).max()) < 1e-7
    # and the decay actually pulls params toward zero relative to wd=0
    tx0 = adafactor(lr=1e-3, weight_decay=0.0)
    u0, _ = tx0.update(grads, tx0.init(params), params)
    assert float((u["w"] - u0["w"]).max()) < 0.0  # extra negative term ∝ +w


def test_inception_sweep_cache_does_not_pin_images():
    """The sweep cache must hold a WEAK reference: identity caching works
    while the caller keeps the array, but the cache must not keep a
    multi-GB image set alive after the caller drops it."""
    import gc
    import weakref

    import numpy as np

    from dmtpu.eval.inception import InceptionFeatureExtractor

    ex = InceptionFeatureExtractor.__new__(InceptionFeatureExtractor)
    ex.batch_size = 4
    ex._np = np
    ex.variables = None
    calls = []
    ex._run = lambda v, b: (np.zeros((len(b), 3), np.float32),
                            np.zeros((len(b), 5), np.float32))
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    out1 = ex._batched(imgs)
    assert ex._batched(imgs) is out1  # identity-cached while alive
    ref = weakref.ref(imgs)
    del imgs
    gc.collect()
    assert ref() is None  # the cache did not pin the array


def test_bench_regression_guard_flags_20pct_drop(tmp_path):
    """Round-4 bench regression guard (VERDICT r3 item 6): a fake -20%
    perturbation of any throughput metric vs the latest green BENCH_r*.json
    must appear in the regressions list; flat/new/improved metrics must not."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_regression", os.path.join(repo, "benchmarks", "regression.py"))
    reg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(reg)

    prior_parsed = {
        "value": 2.75,
        "extra": {"dit_xl2_256_samples_per_sec": 12.0,
                  "sd15_train_imgs_per_sec": 19.5,
                  "sd15_batch": 16,  # not a throughput key: never compared
                  "a100_baselines": {"sd15": 1.6}},
    }
    # rc!=0 / parsed=null artifacts (like BENCH_r03) must be skipped; the
    # highest green n wins.
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"n": 2, "rc": 0, "parsed": prior_parsed}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"n": 3, "rc": 1, "parsed": None}))
    prior = reg.load_prior_bench(str(tmp_path))
    assert prior is not None and prior["n"] == 2

    current = {
        "value": 2.75,  # flat: fine
        "extra": {"dit_xl2_256_samples_per_sec": 12.0 * 0.8,  # -20%: flagged
                  "sd15_train_imgs_per_sec": 21.0,  # improved: fine
                  "sdxl_1024_samples_per_sec": 0.33},  # new metric: fine
    }
    regs = reg.find_regressions(current, prior)
    assert len(regs) == 1 and regs[0].startswith(
        "dit_xl2_256_samples_per_sec: 12 -> 9.6 (-20.0% vs r02)")
    # no prior artifact at all -> no regressions, no crash
    assert reg.find_regressions(current, None) == []
    # within-tolerance (-5%) not flagged
    ok = {"value": 2.75 * 0.95, "extra": {}}
    assert reg.find_regressions(ok, prior) == []
