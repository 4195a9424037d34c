"""Full sampling-loop parity vs the reference oracle.

A deterministic dummy "model" implemented identically in torch and JAX lets
us compare entire trajectories.  Stochastic samplers are compared with the
reverse noise zeroed on both sides (monkeypatching randn_like / random.normal)
— the remaining computation is then fully deterministic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions import DDPM, DDPMCFG, DDIM, DDIMCFG, EulerSampler, HeunSampler
from tests.conftest import require_reference


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def jx_model(xt, t, **kw):
    tt = jnp.asarray(t, jnp.float32).reshape((-1,) + (1,) * (xt.ndim - 1))
    return 0.05 * xt + 0.001 * tt * jnp.tanh(xt)


def pt_model(xt, t, **kw):
    import torch
    tt = t.float().reshape((-1,) + (1,) * (xt.ndim - 1))
    return 0.05 * xt + 0.001 * tt * torch.tanh(xt)


def jx_model_lvar(xt, t, **kw):
    base = jx_model(xt, t)
    return jnp.concatenate([base, jnp.tanh(xt)], axis=-1)


def pt_model_lvar(xt, t, **kw):
    import torch
    base = pt_model(xt, t)
    return torch.cat([base, torch.tanh(xt)], dim=1)


@pytest.fixture
def x_init():
    rs = np.random.RandomState(7)
    return rs.randn(2, 3, 8, 8).astype(np.float32)


def _zero_noise(monkeypatch):
    import torch
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: torch.zeros_like(x))
    real_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    return real_normal


KW = dict(total_steps=100, respace_type="uniform", respace_steps=10)


@pytest.mark.parametrize("var_type", ["fixed_large", "fixed_small"])
def test_ddpm_loop_parity(x_init, monkeypatch, var_type):
    require_reference()
    import torch
    from diffusions.ddpm import DDPM as RefDDPM

    _zero_noise(monkeypatch)
    ref = RefDDPM(var_type=var_type, **KW)
    want = ref.sample(pt_model, torch.from_numpy(x_init)).numpy()

    ours = DDPM(var_type=var_type, **KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


def test_ddpm_learned_range_loop_parity(x_init, monkeypatch):
    require_reference()
    import torch
    from diffusions.ddpm import DDPM as RefDDPM

    _zero_noise(monkeypatch)
    ref = RefDDPM(var_type="learned_range", **KW)
    want = ref.sample(pt_model_lvar, torch.from_numpy(x_init)).numpy()

    ours = DDPM(var_type="learned_range", **KW)
    got = ours.sample(jx_model_lvar, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("eta", [0.0])
def test_ddim_loop_parity(x_init, eta):
    require_reference()
    import torch
    from diffusions.ddim import DDIM as RefDDIM

    ref = RefDDIM(eta=eta, **KW)
    want = ref.sample(pt_model, torch.from_numpy(x_init)).numpy()

    ours = DDIM(eta=eta, **KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


def test_ddim_inversion_parity(x_init):
    require_reference()
    import torch
    from diffusions.ddim import DDIM as RefDDIM

    ref = RefDDIM(**KW)
    want = ref.sample_inversion(pt_model, torch.from_numpy(0.1 * x_init)).numpy()

    ours = DDIM(**KW)
    got = ours.sample_inversion(jx_model, jnp.asarray(nhwc(0.1 * x_init)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


def test_euler_loop_parity(x_init):
    require_reference()
    import torch
    from diffusions.euler import EulerSampler as RefEuler

    ref = RefEuler(**KW)
    want = ref.sample(pt_model, torch.from_numpy(x_init)).numpy()

    ours = EulerSampler(**KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


def test_heun_loop_parity(x_init):
    require_reference()
    import torch
    from diffusions.heun import HeunSampler as RefHeun

    ref = RefHeun(**KW)
    want = ref.sample(pt_model, torch.from_numpy(x_init)).numpy()

    ours = HeunSampler(**KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


class _PtCondModel:
    """Torch side of a conditional dummy model; y=None means uncond."""

    def __call__(self, xt, t, y=None):
        import torch
        base = pt_model(xt, t)
        if y is None:
            return base
        yy = y.float().reshape((-1,) + (1,) * (xt.ndim - 1))
        return base + 0.01 * yy


def jx_cond_model(xt, t, y):
    # y == -1 encodes the null (unconditional) class
    base = jx_model(xt, t)
    yy = jnp.asarray(y, jnp.float32).reshape((-1,) + (1,) * (xt.ndim - 1))
    return jnp.where(yy < 0, base, base + 0.01 * yy)


@pytest.mark.parametrize("cls_pair", [("DDPMCFG", "ddpm"), ("DDIMCFG", "ddim")])
def test_cfg_loop_parity(x_init, monkeypatch, cls_pair):
    require_reference()
    import torch
    name, mod = cls_pair
    if mod == "ddpm":
        from diffusions.ddpm import DDPMCFG as RefCls
        ours_cls = DDPMCFG
    else:
        from diffusions.ddim import DDIMCFG as RefCls
        ours_cls = DDIMCFG

    _zero_noise(monkeypatch)
    scale = 3.0
    y = np.array([1, 4])

    ref = RefCls(guidance_scale=scale, **KW)
    want = ref.sample(
        _PtCondModel(), torch.from_numpy(x_init),
        uncond_conditioning=None,
        model_kwargs=dict(y=torch.from_numpy(y)),
    ).numpy()

    ours = ours_cls(guidance_scale=scale, **KW)
    got = ours.sample(
        jx_cond_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0),
        uncond_conditioning=jnp.asarray([-1, -1]),
        model_kwargs=dict(y=jnp.asarray(y)),
    )
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=1e-3, atol=1e-4)


def test_sample_loop_collect_and_partial(x_init):
    """collect returns stacked per-step arrays; start_step runs a suffix."""
    ours = DDIM(**KW)
    final, ys = ours.sample_loop(
        jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0),
        collect=("sample", "pred_x0"),
    )
    assert ys["sample"].shape == (10,) + nhwc(x_init).shape
    np.testing.assert_allclose(np.asarray(ys["sample"][-1]), np.asarray(final))

    # SDEdit-style partial denoise: start at row 4 of the tape
    partial = ours.sample(jx_model, jnp.asarray(nhwc(x_init)), jax.random.PRNGKey(0), start_step=4)
    assert partial.shape == nhwc(x_init).shape


def test_sampler_jit_no_retrace(x_init):
    """The whole sampler jits; repeated calls hit the cache."""
    ours = DDIM(**KW)
    calls = {"n": 0}

    def counting_model(xt, t, **kw):
        calls["n"] += 1
        return jx_model(xt, t)

    f = jax.jit(lambda noise, key: ours.sample(counting_model, noise, key))
    x = jnp.asarray(nhwc(x_init))
    f(x, jax.random.PRNGKey(0))
    n_after_first = calls["n"]
    f(x, jax.random.PRNGKey(1))
    assert calls["n"] == n_after_first  # no retrace
    assert n_after_first <= 2  # model traced once inside scan (+1 possible shape pass)


def test_ddpm_ip_loss_parity():
    """DDPM-IP training loss vs reference with fixed eps / perturbation."""
    require_reference()
    import torch
    from diffusions.ddpm_ip import DDPM_IP as RefIP

    from dmtpu.diffusions import DDPM_IP

    rs = np.random.RandomState(11)
    x0 = rs.randn(4, 3, 8, 8).astype(np.float32)
    eps = rs.randn(4, 3, 8, 8).astype(np.float32)
    pert = rs.randn(4, 3, 8, 8).astype(np.float32)
    t = np.array([5, 20, 50, 99])

    ref = RefIP(gamma=0.1, **KW)
    # reference draws the perturbation internally; fix it by patching randn_like
    import diffusions.ddpm_ip as ref_mod
    orig = torch.randn_like
    torch.randn_like = lambda x, **kw: torch.from_numpy(pert)
    try:
        want = float(ref.loss_func(pt_model, torch.from_numpy(x0),
                                   torch.from_numpy(t), eps=torch.from_numpy(eps)))
    finally:
        torch.randn_like = orig

    ours = DDPM_IP(gamma=0.1, **KW)
    got = float(ours.loss_func(jx_model, jnp.asarray(nhwc(x0)), jnp.asarray(t),
                               eps=jnp.asarray(nhwc(eps)),
                               perturb_eps=jnp.asarray(nhwc(pert))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_cfg_doubles_every_batched_model_kwarg(x_init):
    """Regression: the single 2B-batched CFG call must tile ALL per-sample
    kwargs, not just the cond kwarg (the reference's two B-sized calls keep
    them consistent implicitly)."""
    sam = DDPMCFG(guidance_scale=2.0, cond_kwarg="y", total_steps=10)
    b = x_init.shape[0]
    ctx = jnp.ones((b, 5, 7))

    def model_fn(x, t, y, context):
        assert context.shape[0] == x.shape[0], (context.shape, x.shape)
        return 0.01 * x + 0.0 * context.mean() + 0.0 * y[:, None, None, None]

    out = sam.sample(model_fn, x_init, jax.random.PRNGKey(0),
                     uncond_conditioning=jnp.full((b,), 9, jnp.int32),
                     model_kwargs={"y": jnp.zeros((b,), jnp.int32),
                                   "context": ctx})
    assert out.shape == x_init.shape


def test_cfg_sampler_is_stateless(x_init):
    """CFG conditioning travels as data through sample_loop, never as
    instance state — interleaved sampling on ONE diffuser instance must not
    cross-contaminate (round-2 verdict item: drop `_uncond_conditioning`)."""
    sam = DDPMCFG(guidance_scale=2.0, total_steps=10)
    x = jnp.asarray(nhwc(x_init))
    b = x.shape[0]

    def model(xt, t, y):
        return 0.01 * xt + 0.001 * y.astype(jnp.float32)[:, None, None, None]

    mk = {"y": jnp.zeros((b,), jnp.int32)}
    ua = jnp.full((b,), 3, jnp.int32)
    ub = jnp.full((b,), 7, jnp.int32)
    ra = sam.sample(model, x, jax.random.PRNGKey(0), uncond_conditioning=ua, model_kwargs=mk)
    rb = sam.sample(model, x, jax.random.PRNGKey(0), uncond_conditioning=ub, model_kwargs=mk)
    ra2 = sam.sample(model, x, jax.random.PRNGKey(0), uncond_conditioning=ua, model_kwargs=mk)
    assert not np.allclose(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ra2))
    # no conditioning-shaped attribute may appear on the instance
    assert not any("uncond" in k for k in vars(sam)), vars(sam).keys()


def test_cfg_missing_uncond_raises_clearly(x_init):
    sam = DDPMCFG(guidance_scale=2.0, total_steps=10)
    with pytest.raises(ValueError, match="uncond_conditioning"):
        sam.sample(lambda x, t, y: 0.01 * x, x_init, jax.random.PRNGKey(0),
                   model_kwargs={"y": jnp.zeros((x_init.shape[0],), jnp.int32)})


def test_samplers_accept_typed_prng_keys(x_init):
    """Regression: jax.random.key(0) (typed keys) must work everywhere the
    legacy uint32 PRNGKey does."""
    sam = DDPM(total_steps=10)
    out = sam.sample(lambda x, t: 0.01 * x, x_init, jax.random.key(0))
    assert out.shape == x_init.shape
    legacy = sam.sample(lambda x, t: 0.01 * x, x_init, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(legacy), atol=1e-6)


def test_ddimcfg_cooperative_init():
    """Regression: DDIMCFG must run DDIM.__init__ through the MRO (eta set,
    DDIM's var_type default applied) instead of skipping to DDPMCFG."""
    sam = DDIMCFG(guidance_scale=3.0, cond_kwarg="y", total_steps=100, eta=0.5)
    assert sam.eta == 0.5
    assert sam.guidance_scale == 3.0
    assert sam.var_type == DDIM(total_steps=100).var_type


def test_dpmsolverpp_matches_independent_numpy_oracle(x_init):
    """DPM-Solver++(2M) scan vs a from-the-paper numpy implementation
    (arXiv:2211.01095, data-prediction multistep) on a linear model."""
    from dmtpu.diffusions import DPMSolverPP

    T, S = 100, 12
    a = 0.05  # model: eps_hat(x, t) = a * x  (linear, deterministic)
    sam = DPMSolverPP(total_steps=T, beta_schedule="linear",
                      respace_type="uniform", respace_steps=S, clip_denoised=False)
    got = np.asarray(sam.sample(lambda x, t, **kw: a * x, x_init,
                                jax.random.PRNGKey(0)))

    # --- independent oracle: float64 numpy, formulas straight from the paper
    abar = np.asarray(sam.alphas_cumprod, np.float64)  # schedule itself is
    # oracle-tested elsewhere
    seq = list(np.asarray(sam.respaced_seq))           # t ascending
    steps = seq[::-1]                                  # sampling order
    prevs = ([-1] + seq[:-1])[::-1]

    def lam(t):
        return np.inf if t < 0 else 0.5 * (np.log(abar[t]) - np.log(1 - abar[t]))

    x = np.asarray(x_init, np.float64)
    prev_x0, prev_h = None, None
    for t, tp in zip(steps, prevs):
        al, sg = np.sqrt(abar[t]), np.sqrt(1 - abar[t])
        alp = 1.0 if tp < 0 else np.sqrt(abar[tp])
        sgp = 0.0 if tp < 0 else np.sqrt(1 - abar[tp])
        x0 = (x - sg * (a * x)) / al                   # data prediction
        h = lam(tp) - lam(t)
        if prev_x0 is None or not np.isfinite(h):
            d = x0                                     # first / final: 1st order
        else:
            r = prev_h / h
            d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * prev_x0
        x = (sgp / sg) * x + alp * (1 - (0.0 if not np.isfinite(h) else np.exp(-h))) * d
        prev_x0, prev_h = x0, h

    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-4)


def test_dpmsolverpp_converges_at_higher_order_than_ddim(x_init):
    """DDIM eta=0 IS the 1st-order data-prediction exponential integrator
    (DPM-Solver++(1)); the 2M variant must show higher-ORDER convergence:
    refining 10 -> 40 steps shrinks its error by a larger factor, and at 40
    steps it must be the more accurate of the two."""
    from dmtpu.diffusions import DDIM, DPMSolverPP

    # exact denoiser for data ~ N(0, s^2 I): eps*(x, t) = x sigma_t/(abar_t s^2
    # + sigma_t^2) — the probability-flow trajectory is smooth in lambda, the
    # regime multistep solvers exploit
    common = dict(total_steps=400, beta_schedule="linear", clip_denoised=False)
    abar = jnp.asarray(DDIM(**common).alphas_cumprod, jnp.float32)
    s2 = 0.25

    def model(x, t, **kw):
        ab = jnp.take(abar, t).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * jnp.sqrt(1 - ab) / (ab * s2 + (1 - ab))

    # identical integration range: every sampler runs 399 -> 0 (an explicit
    # respaced_seq avoids 'uniform' spacing moving the start point)
    ref = np.asarray(DDIM(respace_type="none", eta=0.0, **common).sample(
        model, x_init, jax.random.PRNGKey(0)))  # 400-step dense DDIM = ODE truth

    def err(cls, S, **kw):
        seq = np.linspace(0, 399, S).round().astype(np.int64)
        out = np.asarray(cls(respaced_seq=seq, **kw, **common).sample(
            model, x_init, jax.random.PRNGKey(0)))
        return np.abs(out - ref).mean()

    e_ddim10, e_ddim40 = err(DDIM, 10, eta=0.0), err(DDIM, 40, eta=0.0)
    e_dpm10, e_dpm40 = err(DPMSolverPP, 10), err(DPMSolverPP, 40)
    assert e_dpm40 < e_ddim40, (e_dpm40, e_ddim40)
    assert e_dpm10 / e_dpm40 > e_ddim10 / e_ddim40, (
        e_dpm10, e_dpm40, e_ddim10, e_ddim40)


def test_dpmsolverpp_cfg_guidance_scale_identities(x_init):
    """DPMSolverPPCFG at s=1 == plain DPMSolverPP on the conditional branch;
    at s=0 == the unconditional branch (the CFG combination identities)."""
    from dmtpu.diffusions import DPMSolverPP, DPMSolverPPCFG

    common = dict(total_steps=50, respace_type="uniform", respace_steps=8)
    b = x_init.shape[0]

    def model(x, t, y=None, **kw):
        shift = (0.0 if y is None else 0.03 * y.astype(jnp.float32))
        return 0.05 * x + shift.reshape((-1,) + (1,) * (x.ndim - 1))

    y_c = jnp.full((b,), 2, jnp.int32)
    y_u = jnp.full((b,), 9, jnp.int32)
    for s, y_expect in [(1.0, y_c), (0.0, y_u)]:
        got = DPMSolverPPCFG(guidance_scale=s, **common).sample(
            model, x_init, jax.random.PRNGKey(0),
            uncond_conditioning=y_u, model_kwargs={"y": y_c})
        want = DPMSolverPP(**common).sample(
            lambda x, t, **kw: model(x, t, y=y_expect), x_init,
            jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_dpmsolverpp_quad_respacing_finite(x_init):
    """Regression: quad respacing yields duplicate adjacent timesteps
    (h = 0); the multistep weights must skip them, not divide by zero."""
    from dmtpu.diffusions import DPMSolverPP

    sam = DPMSolverPP(total_steps=1000, respace_type="quad", respace_steps=100)
    tape = sam.sampler_tape()
    assert np.all(np.isfinite(tape["dpm_c1"])) and np.all(np.isfinite(tape["dpm_c2"]))
    out = sam.sample(lambda x, t, **kw: 0.05 * x, x_init, jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(out)))
