"""PFDiff-1 sampler: exactness, tape structure, accuracy-at-equal-NFE, CFG.

No reference counterpart (beyond parity; PAPERS.md arXiv 2408.08822), so the
oracles are mathematical identities instead of the torch reference:

- With a CONSTANT-eps model the deterministic DDIM map is transitive
  (jump t->m->s == jump t->s exactly), and PFDiff's buffered/future scores
  all equal that constant — so PFDiff over an S-step grid must reproduce
  DDIM over the same grid bit-for-bit (up to f32 rounding).
- With the analytic Gaussian denoiser (same one the DPM-Solver++ tests use)
  the probability-flow ODE truth is a dense DDIM run; PFDiff must beat plain
  DDIM at EQUAL model-call budget (the paper's claim).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions import DDIM, PFDiffDDIM, PFDiffDDIMCFG


@pytest.fixture
def x_init():
    rs = np.random.RandomState(11)
    return rs.randn(2, 8, 8, 3).astype(np.float32)


def _grid(steps: int) -> np.ndarray:
    """Explicit S-point grid (uniform respacing's ceil-stride semantics make
    len(get_respaced_seq(...)) != respace_steps for some counts, e.g. 51->53)."""
    return np.linspace(0, 999, steps).round().astype(np.int64)


@pytest.mark.parametrize("steps", [2, 3, 50, 51])
def test_constant_eps_equals_ddim_same_grid(x_init, steps):
    common = dict(total_steps=1000, respaced_seq=_grid(steps), clip_denoised=False)
    const = jnp.asarray(
        0.3 * np.random.RandomState(3).randn(1, 1, 1, 3), jnp.float32)

    def model(x, t, **kw):
        return jnp.broadcast_to(const, x.shape)

    want = DDIM(eta=0.0, **common).sample(model, x_init, jax.random.PRNGKey(0))
    got = PFDiffDDIM(**common).sample(model, x_init, jax.random.PRNGKey(0))
    # identical in exact arithmetic (DDIM eta=0 is transitive in pred_x0/eps
    # space for a constant eps); f32 rounding differs because PFDiff composes
    # the jumps in a different order
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("steps,n_pairs,has_trail,nfe", [
    (1, 0, False, 1),
    (2, 0, True, 2),
    (3, 1, False, 2),
    (50, 24, True, 26),
    (51, 25, False, 26),
])
def test_tape_structure_and_nfe(steps, n_pairs, has_trail, nfe):
    d = PFDiffDDIM(total_steps=1000, respaced_seq=_grid(steps))
    anchor, spring, mid, full, trail = d.pfdiff_tapes()
    assert anchor["t"].shape == (1,)
    if n_pairs == 0:
        assert spring is None and mid is None and full is None
    else:
        assert spring["t"].shape == mid["t"].shape == full["t"].shape == (n_pairs,)
        # springboard and full jump start from the same t; the model runs at
        # the springboard's TARGET timestep (mid row's t)
        np.testing.assert_array_equal(spring["t"], full["t"])
        np.testing.assert_array_equal(mid["ac"], spring["ac_prev"])
        np.testing.assert_array_equal(mid["ac_prev"], full["ac_prev"])
    assert (trail is not None) == has_trail
    assert d.nfe == nfe
    # the grid is covered exactly once: anchor + 2 per pair + trailing
    assert 1 + 2 * n_pairs + int(has_trail) == steps if steps > 1 else True


def test_beats_ddim_at_equal_nfe(x_init):
    """PFDiff-1 on a 41-step grid costs 21 NFE; it must be closer to the
    dense-DDIM ODE truth than plain 21-step DDIM (the paper's claim, here
    on the analytic Gaussian denoiser)."""
    common = dict(total_steps=400, beta_schedule="linear", clip_denoised=False)
    abar = jnp.asarray(DDIM(**common).alphas_cumprod, jnp.float32)
    s2 = 0.25

    def model(x, t, **kw):
        ab = jnp.take(abar, t).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * jnp.sqrt(1 - ab) / (ab * s2 + (1 - ab))

    ref = np.asarray(DDIM(respace_type="none", eta=0.0, **common).sample(
        model, x_init, jax.random.PRNGKey(0)))

    def err(cls, S):
        seq = np.linspace(0, 399, S).round().astype(np.int64)
        out = np.asarray(cls(respaced_seq=seq, **common).sample(
            model, x_init, jax.random.PRNGKey(0)))
        return np.abs(out - ref).mean()

    pf = PFDiffDDIM(respaced_seq=np.linspace(0, 399, 41).round().astype(np.int64),
                    **common)
    assert pf.nfe == 21
    e_pf = err(PFDiffDDIM, 41)

    class _DDIM0(DDIM):
        def __init__(self, **kw):
            super().__init__(eta=0.0, **kw)

    e_ddim = err(_DDIM0, 21)
    assert e_pf < e_ddim, (e_pf, e_ddim)


def test_cfg_guidance_scale_identities(x_init):
    """PFDiffDDIMCFG at s=1 == plain PFDiffDDIM on the conditional branch;
    at s=0 == the unconditional branch."""
    common = dict(total_steps=50, respace_type="uniform", respace_steps=9)
    b = x_init.shape[0]

    def model(x, t, y=None, **kw):
        shift = (0.0 if y is None else 0.03 * y.astype(jnp.float32))
        return 0.05 * x + shift.reshape((-1,) + (1,) * (x.ndim - 1))

    y_c = jnp.full((b,), 2, jnp.int32)
    y_u = jnp.full((b,), 9, jnp.int32)
    for s, y_expect in [(1.0, y_c), (0.0, y_u)]:
        got = PFDiffDDIMCFG(guidance_scale=s, **common).sample(
            model, x_init, jax.random.PRNGKey(0),
            uncond_conditioning=y_u, model_kwargs={"y": y_c})
        want = PFDiffDDIM(**common).sample(
            lambda x, t, **kw: model(x, t, y=y_expect), x_init,
            jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_rejects_stochastic_eta():
    with pytest.raises(ValueError, match="eta"):
        PFDiffDDIM(total_steps=100, eta=0.5)


@pytest.mark.parametrize("steps,rows", [(50, 25), (51, 25)])
def test_collect_shapes_and_final_consistency(x_init, steps, rows):
    """collect stacks one row per pair (+1 for a trailing step) and its last
    'sample' row is the returned final state."""
    d = PFDiffDDIM(total_steps=1000, respaced_seq=_grid(steps),
                   clip_denoised=False)

    def model(x, t, **kw):
        return 0.05 * x

    final, ys = d.sample_loop(model, x_init, jax.random.PRNGKey(0),
                              collect=("sample", "pred_x0"))
    assert ys["sample"].shape == (rows,) + x_init.shape
    assert ys["pred_x0"].shape == (rows,) + x_init.shape
    np.testing.assert_allclose(np.asarray(ys["sample"][-1]), np.asarray(final),
                               rtol=1e-6, atol=1e-6)


def test_jittable(x_init):
    d = PFDiffDDIM(total_steps=100, respace_type="uniform", respace_steps=10)

    def model(x, t, **kw):
        return 0.05 * x

    out = jax.jit(lambda n, k: d.sample(model, n, k))(
        jnp.asarray(x_init), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
