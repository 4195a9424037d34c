"""DeepCache: UNet full/shallow split correctness + the serving loop.

reference has no serving-acceleration layer (beyond-parity feature); the
correctness oracle is the model itself: a FULL DeepCache pass must equal the
plain forward, and a SHALLOW pass spliced with a same-step cache must
reproduce the plain forward exactly (the split touches routing, not math).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.diffusions import DDIM
from dmtpu.diffusions.deepcache import deepcache_sample
from dmtpu.models.stablediffusion.unet import SDUNetModel

CPU = jax.devices("cpu")[0]

KW = dict(in_channels=4, model_channels=32, out_channels=4, num_res_blocks=2,
          attention_resolutions=(2, 1), channel_mult=(1, 2, 2), num_heads=4,
          use_spatial_transformer=True, transformer_depth=1, context_dim=16,
          legacy=False)


@pytest.fixture(scope="module")
def setup():
    with jax.default_device(CPU):
        model = SDUNetModel(**KW)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        t = jnp.array([3, 7])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        params = model.init(jax.random.PRNGKey(2), x, t, ctx)
        # the zero-init output head would make every output 0 — perturb
        leaves, td = jax.tree.flatten(params)
        leaves = [l + 0.01 * jax.random.normal(jax.random.PRNGKey(50 + i),
                                               l.shape, l.dtype)
                  for i, l in enumerate(leaves)]
        params = jax.tree.unflatten(td, leaves)
    return model, params, x, t, ctx


@pytest.mark.parametrize("skip", [1, 3, 7])
def test_full_pass_equals_plain_and_fresh_cache_splices_exactly(setup, skip):
    model, params, x, t, ctx = setup
    with jax.default_device(CPU):
        want = model.apply(params, x, t, ctx)
        out_full, u = model.apply(params, x, t, ctx, dc_skip=skip)
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(want))
        assert u.shape[0] == 2 and u.ndim == 4
        out_shallow, u2 = model.apply(params, x, t, ctx, dc_skip=skip,
                                      dc_cached=u)
        # same step, fresh cache -> the shallow slice must be EXACT
        np.testing.assert_array_equal(np.asarray(out_shallow), np.asarray(want))
        assert u2 is u or np.array_equal(np.asarray(u2), np.asarray(u))


def test_dc_skip_bounds(setup):
    model, params, x, t, ctx = setup
    with jax.default_device(CPU):
        for bad in (0, 99):
            with pytest.raises(ValueError, match="dc_skip"):
                model.apply(params, x, t, ctx, dc_skip=bad)


def test_deepcache_loop_interval1_equals_plain_ddim(setup):
    model, params, x, t, ctx = setup
    diffuser = DDIM(total_steps=100, respace_type="uniform", respace_steps=6)
    noise = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 4))
    key = jax.random.PRNGKey(10)
    with jax.default_device(CPU):
        want = jax.jit(lambda n, k: diffuser.sample(
            lambda xx, tt, **kw: model.apply(params, xx, tt, ctx), n, k))(
            noise, key)

        def full_fn(xx, tt):
            return model.apply(params, xx, tt, ctx, dc_skip=3)

        def shallow_fn(xx, tt, u):
            return model.apply(params, xx, tt, ctx, dc_skip=3, dc_cached=u)[0]

        got1 = jax.jit(lambda n, k: deepcache_sample(
            diffuser, full_fn, shallow_fn, n, k, interval=1))(noise, key)
        # interval=1 -> every step full -> identical trajectory (eta=0)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        got2 = jax.jit(lambda n, k: deepcache_sample(
            diffuser, full_fn, shallow_fn, n, k, interval=2))(noise, key)
        assert np.all(np.isfinite(np.asarray(got2)))
        # the cache is actually being reused: trajectory differs from full...
        assert not np.allclose(np.asarray(got2), np.asarray(want), atol=1e-6)
        # ...but stays in the same ballpark (sane reuse, not garbage)
        denom = float(np.abs(np.asarray(want)).mean())
        rel = float(np.abs(np.asarray(got2) - np.asarray(want)).mean()) / denom
        assert rel < 0.5, f"deepcache trajectory diverged: rel err {rel}"


def test_pfdiff_deepcache_interval1_equals_plain_pfdiff(setup):
    """The PFDiff × DeepCache composition with interval=1 (every call full)
    must reproduce plain PFDiffDDIM.sample exactly; interval=2 must reuse the
    cache (trajectory differs) while staying sane."""
    from dmtpu.diffusions import PFDiffDDIM
    from dmtpu.diffusions.deepcache import pfdiff_deepcache_sample

    model, params, x, t, ctx = setup
    # explicit 8-point grid: anchor + 3 pairs + trailing step all exercised
    diffuser = PFDiffDDIM(
        total_steps=100,
        respaced_seq=np.linspace(0, 99, 8).round().astype(np.int64))
    noise = jax.random.normal(jax.random.PRNGKey(13), (2, 16, 16, 4))
    with jax.default_device(CPU):
        want = jax.jit(lambda n: diffuser.sample(
            lambda xx, tt, **kw: model.apply(params, xx, tt, ctx), n,
            jax.random.PRNGKey(0)))(noise)

        def full_fn(xx, tt):
            return model.apply(params, xx, tt, ctx, dc_skip=3)

        def shallow_fn(xx, tt, u):
            return model.apply(params, xx, tt, ctx, dc_skip=3, dc_cached=u)[0]

        got1 = jax.jit(lambda n: pfdiff_deepcache_sample(
            diffuser, full_fn, shallow_fn, n, interval=1))(noise)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        got2 = jax.jit(lambda n: pfdiff_deepcache_sample(
            diffuser, full_fn, shallow_fn, n, interval=2))(noise)
        assert np.all(np.isfinite(np.asarray(got2)))
        assert not np.allclose(np.asarray(got2), np.asarray(want), atol=1e-6)
        denom = float(np.abs(np.asarray(want)).mean())
        rel = float(np.abs(np.asarray(got2) - np.asarray(want)).mean()) / denom
        assert rel < 0.5, f"pfdiff+deepcache trajectory diverged: rel err {rel}"


def test_deepcache_interval1_exact_for_stochastic_and_guided(setup):
    """interval=1 must be trajectory-exact vs diffuser.sample() even when the
    sampler draws reverse noise (DDPM) and runs a guidance hook — i.e. the
    loop derives keys exactly like sample_loop (split(rng, (n, 2)); key[0]
    noise, key[1] guidance) and calls apply_guidance."""
    from dmtpu.diffusions import DDPM

    model, params, x, t, ctx = setup

    class PerturbGuidedDDPM(DDPM):
        def apply_guidance(self, out, xt, c, rng):
            # rng-dependent so a key[1] mismatch is caught, not masked
            bump = 0.01 * jax.random.normal(rng, out["sample"].shape)
            return dict(out, sample=out["sample"] + bump)

    diffuser = PerturbGuidedDDPM(total_steps=100, respace_type="uniform",
                                 respace_steps=5, var_type="fixed_small")
    noise = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 16, 4))
    key = jax.random.PRNGKey(12)
    with jax.default_device(CPU):
        want = jax.jit(lambda n, k: diffuser.sample(
            lambda xx, tt, **kw: model.apply(params, xx, tt, ctx), n, k))(
            noise, key)

        def full_fn(xx, tt):
            return model.apply(params, xx, tt, ctx, dc_skip=3)

        def shallow_fn(xx, tt, u):
            return model.apply(params, xx, tt, ctx, dc_skip=3, dc_cached=u)[0]

        got = jax.jit(lambda n, k: deepcache_sample(
            diffuser, full_fn, shallow_fn, n, k, interval=1))(noise, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_deepcache_cfg_postprocess_interval1_equals_ddimcfg(setup):
    """The CFG seam (review finding): a 2B-batched DeepCache loop whose
    postprocess splits, per-branch predicts (clip_denoised clips each branch
    like DDPMCFG) and combines eps must reproduce DDIMCFG.sample exactly at
    interval=1 — the semantics scripts/sample_sd.py --deepcache relies on."""
    from dmtpu.diffusions import DDIMCFG

    model, params, x, t, ctx = setup
    s = 3.0
    dp = dict(total_steps=100, respace_type="uniform", respace_steps=6,
              clip_denoised=True)
    noise = jax.random.normal(jax.random.PRNGKey(20), (2, 16, 16, 4))
    key = jax.random.PRNGKey(21)
    uctx = jnp.zeros_like(ctx)
    with jax.default_device(CPU):
        cfg = DDIMCFG(guidance_scale=s, cond_kwarg="text_embed", **dp)
        want = jax.jit(lambda n, k: cfg.sample(
            lambda xx, tt, text_embed=None, **kw: model.apply(
                params, xx, tt, text_embed),
            n, k, uncond_conditioning=uctx,
            model_kwargs=dict(text_embed=ctx)))(noise, key)

        diffuser = DDIM(**dp)
        ctx2 = jnp.concatenate([ctx, uctx])

        def cfg_postprocess(out2, xc, c):
            oc, ou = jnp.split(out2, 2, axis=0)
            eps_c = diffuser.predict(oc, xc, c)["pred_eps"]
            eps_u = diffuser.predict(ou, xc, c)["pred_eps"]
            return (1.0 - s) * eps_u + s * eps_c

        def full_fn(xx, tt):
            return model.apply(params, jnp.concatenate([xx, xx]),
                               jnp.concatenate([tt, tt]), ctx2, dc_skip=3)

        def shallow_fn(xx, tt, u):
            return model.apply(params, jnp.concatenate([xx, xx]),
                               jnp.concatenate([tt, tt]), ctx2, dc_skip=3,
                               dc_cached=u)[0]

        got = jax.jit(lambda n, k: deepcache_sample(
            diffuser, full_fn, shallow_fn, n, k, interval=1,
            postprocess=cfg_postprocess))(noise, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        got2 = jax.jit(lambda n, k: deepcache_sample(
            diffuser, full_fn, shallow_fn, n, k, interval=2,
            postprocess=cfg_postprocess))(noise, key)
        assert np.all(np.isfinite(np.asarray(got2)))
        assert not np.allclose(np.asarray(got2), np.asarray(want), atol=1e-6)


def test_pfdiff_deepcache_cfg_eps_fn_interval1_equals_pfdiffcfg(setup):
    """The composed PFDiff x DeepCache loop with the CFG eps_fn at interval=1
    must reproduce PFDiffDDIMCFG.sample exactly (the sample_sd.py
    --sampler pfdiff --deepcache semantics)."""
    from dmtpu.diffusions import PFDiffDDIM, PFDiffDDIMCFG
    from dmtpu.diffusions.deepcache import pfdiff_deepcache_sample

    model, params, x, t, ctx = setup
    s = 3.0
    dp = dict(total_steps=100, respace_type="uniform", respace_steps=8,
              clip_denoised=True)
    noise = jax.random.normal(jax.random.PRNGKey(30), (2, 16, 16, 4))
    uctx = jnp.zeros_like(ctx)
    with jax.default_device(CPU):
        cfg = PFDiffDDIMCFG(guidance_scale=s, cond_kwarg="text_embed", **dp)
        want = jax.jit(lambda n: cfg.sample(
            lambda xx, tt, text_embed=None, **kw: model.apply(
                params, xx, tt, text_embed),
            n, jax.random.PRNGKey(0), uncond_conditioning=uctx,
            model_kwargs=dict(text_embed=ctx)))(noise)

        diffuser = PFDiffDDIM(**dp)
        ctx2 = jnp.concatenate([ctx, uctx])

        def cfg_combine(out2, xc, c):
            oc, ou = jnp.split(out2, 2, axis=0)
            eps_c = diffuser.predict(oc, xc, c)["pred_eps"]
            eps_u = diffuser.predict(ou, xc, c)["pred_eps"]
            return (1.0 - s) * eps_u + s * eps_c

        def full_fn(xx, tt):
            return model.apply(params, jnp.concatenate([xx, xx]),
                               jnp.concatenate([tt, tt]), ctx2, dc_skip=3)

        def shallow_fn(xx, tt, u):
            return model.apply(params, jnp.concatenate([xx, xx]),
                               jnp.concatenate([tt, tt]), ctx2, dc_skip=3,
                               dc_cached=u)[0]

        got = jax.jit(lambda n: pfdiff_deepcache_sample(
            diffuser, full_fn, shallow_fn, n, interval=1,
            eps_fn=cfg_combine))(noise)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        got2 = jax.jit(lambda n: pfdiff_deepcache_sample(
            diffuser, full_fn, shallow_fn, n, interval=2,
            eps_fn=cfg_combine))(noise)
        assert np.all(np.isfinite(np.asarray(got2)))
        assert not np.allclose(np.asarray(got2), np.asarray(want), atol=1e-6)
