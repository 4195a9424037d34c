"""Limited-interval CFG (DDPMCFG/DDIMCFG ``guidance_interval``).

Guidance applies only when t_lo < t <= t_hi; outside, the step makes one
plain conditional call (s=1) via a ``lax.cond`` branch.  Beyond parity
(Kynkaanniemi et al. 2024); exactness anchors: a full-cover interval equals
plain CFG, a no-cover interval equals s=1 sampling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.diffusions import DDIMCFG, DDPMCFG


def _model_fn(x, t, y=None, **kw):
    # deterministic toy: eps depends on x, t and the class embedding, so the
    # cond and uncond branches genuinely differ
    return 0.1 * x + 0.01 * jnp.asarray(y, jnp.float32).reshape(-1, 1, 1, 1) \
        + 0.001 * t.astype(jnp.float32).reshape(-1, 1, 1, 1)


def _run(diffuser, seed=0):
    noise = jax.random.normal(jax.random.PRNGKey(seed), (2, 8, 8, 3))
    y = jnp.array([1, 2], jnp.int32)
    return diffuser.sample(_model_fn, noise, jax.random.PRNGKey(seed + 1),
                           uncond_conditioning=jnp.zeros((2,), jnp.int32),
                           model_kwargs=dict(y=y))


COMMON = dict(total_steps=100, respace_type="uniform", respace_steps=10,
              cond_kwarg="y")


@pytest.mark.parametrize("cls", [DDPMCFG, DDIMCFG])
class TestGuidanceInterval:
    def test_full_cover_equals_plain_cfg(self, cls):
        base = cls(guidance_scale=5.0, **COMMON)
        gi = cls(guidance_scale=5.0, guidance_interval=(-1.0, 100.0), **COMMON)
        np.testing.assert_allclose(np.asarray(_run(base)), np.asarray(_run(gi)),
                                   rtol=1e-6, atol=1e-6)

    def test_no_cover_equals_s1(self, cls):
        s1 = cls(guidance_scale=1.0, **COMMON)
        gi = cls(guidance_scale=7.0, guidance_interval=(-3.0, -1.0), **COMMON)
        np.testing.assert_allclose(np.asarray(_run(s1)), np.asarray(_run(gi)),
                                   rtol=1e-5, atol=1e-6)

    def test_partial_interval_between_the_anchors(self, cls):
        full = _run(cls(guidance_scale=7.0, **COMMON))
        none = _run(cls(guidance_scale=1.0, **COMMON))
        mid = _run(cls(guidance_scale=7.0, guidance_interval=(20.0, 70.0), **COMMON))
        assert bool(jnp.isfinite(mid).all())
        assert not np.allclose(np.asarray(mid), np.asarray(full))
        assert not np.allclose(np.asarray(mid), np.asarray(none))

    def test_jit_compatible(self, cls):
        gi = cls(guidance_scale=3.0, guidance_interval=(20.0, 70.0), **COMMON)
        noise = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))

        @jax.jit
        def f(n, k):
            return gi.sample(_model_fn, n, k,
                             uncond_conditioning=jnp.zeros((2,), jnp.int32),
                             model_kwargs=dict(y=jnp.array([1, 2], jnp.int32)))

        out = f(noise, jax.random.PRNGKey(5))
        assert out.shape == noise.shape and bool(jnp.isfinite(out).all())

    def test_invalid_interval_raises(self, cls):
        with pytest.raises(ValueError, match="t_lo < t_hi"):
            cls(guidance_scale=3.0, guidance_interval=(50.0, 50.0), **COMMON)


def test_solver_cfg_classes_reject_interval():
    # DPM-Solver++/PFDiff CFG bypass _model_step, so accepting the kwarg
    # would silently ignore it (review finding) — they must refuse loudly
    from dmtpu.diffusions import DPMSolverPPCFG, PFDiffDDIMCFG

    for cls in (DPMSolverPPCFG, PFDiffDDIMCFG):
        with pytest.raises(NotImplementedError, match="DDPMCFG/DDIMCFG"):
            cls(guidance_scale=3.0, guidance_interval=(10.0, 60.0), **COMMON)


def test_learned_range_variance_rides_cond_branch():
    # 2C-channel model output: the variance channels must thread through
    # BOTH lax.cond branches (guided and plain)
    def model_2c(x, t, y=None, **kw):
        eps = _model_fn(x, t, y=y)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    d = DDPMCFG(guidance_scale=4.0, guidance_interval=(20.0, 70.0),
                var_type="learned_range", **COMMON)
    noise = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
    out = d.sample(model_2c, noise, jax.random.PRNGKey(7),
                   uncond_conditioning=jnp.zeros((2,), jnp.int32),
                   model_kwargs=dict(y=jnp.array([1, 2], jnp.int32)))
    assert out.shape == noise.shape and bool(jnp.isfinite(out).all())
