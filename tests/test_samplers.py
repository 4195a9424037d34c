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
