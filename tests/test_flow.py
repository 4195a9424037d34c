"""Flow matching / rectified flow: math oracles, solver order, CFG, CLI seam.

No reference counterpart (beyond parity), so — as with PFDiff/DPM-Solver++ —
the oracles are mathematical identities:

- Point-mass data: the optimal velocity field v*(x,u) = (x - x0)/u yields
  STRAIGHT-LINE trajectories, which Euler integrates exactly: one step or
  fifty, the sampler must land on x0 bit-for-bit (up to f32).
- Zero-mean Gaussian data N(0, s^2 I): the probability-flow map is the
  closed form x(u) = sigma(u) * x(1) with sigma(u)^2 = (1-u)^2 s^2 + u^2,
  so x(0) = s * x(1) exactly.  Euler converges at order 1, Heun at order 2.
- A constant-velocity model integrates to x - v exactly for any grid.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions import FlowMatching, FlowMatchingCFG
from dmtpu.diffusions.flow import _shift_u


@pytest.fixture
def x_init():
    rs = np.random.RandomState(7)
    return jnp.asarray(rs.randn(4, 8, 8, 3).astype(np.float32))


# ---------------------------------------------------------------------------
# exactness oracles
# ---------------------------------------------------------------------------
def test_constant_velocity_exact(x_init):
    """dx/du = c integrates to x(0) = x(1) - c for ANY grid/solver."""
    c = jnp.asarray(0.7 * np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    model = lambda x, t, **kw: jnp.broadcast_to(c, x.shape)  # noqa: E731
    for solver in ("euler", "heun"):
        for steps in (1, 3, 50):
            fm = FlowMatching(total_steps=1000, respace_steps=steps, solver=solver)
            out = fm.sample(model, x_init, jax.random.PRNGKey(0))
            np.testing.assert_allclose(np.asarray(out), np.asarray(x_init - c),
                                       rtol=1e-5, atol=1e-5)


def test_point_mass_field_euler_exact(x_init):
    """v*(x,u) = (x - x0)/u gives straight-line trajectories: Euler with any
    step count must land exactly on x0 (div guarded: tape never hits u=0
    as a CURRENT time — it's the final target)."""
    x0 = jnp.asarray(0.3 * np.random.RandomState(1).randn(1, 8, 8, 3), jnp.float32)

    def model(x, t, **kw):
        u = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / jnp.maximum(u, 1e-12)

    for steps in (1, 2, 17):
        fm = FlowMatching(total_steps=1000, respace_steps=steps, solver="euler")
        out = fm.sample(model, x_init, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out),
                                   np.broadcast_to(np.asarray(x0), out.shape),
                                   rtol=1e-4, atol=1e-4)


def _gaussian_velocity(s: float):
    """Optimal velocity for x0 ~ N(0, s^2 I): v*(x,u) = (u - (1-u)s^2)/sigma^2(u) x."""
    def model(x, t, **kw):
        u = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        var = (1 - u) ** 2 * s**2 + u**2
        return (u - (1 - u) * s**2) / var * x
    return model


def test_gaussian_flow_map_and_solver_order(x_init):
    """Truth: x(0) = s * x(1).  Euler converges ~O(h), Heun ~O(h^2)."""
    s = 0.5
    model = _gaussian_velocity(s)
    truth = np.asarray(s * x_init)

    def err(solver, steps):
        fm = FlowMatching(total_steps=1000, respace_steps=steps, solver=solver)
        out = fm.sample(model, x_init, jax.random.PRNGKey(0))
        return float(jnp.max(jnp.abs(out - truth)))

    e_eu_20, e_eu_40 = err("euler", 20), err("euler", 40)
    e_he_20, e_he_40 = err("heun", 20), err("heun", 40)
    # convergence to the closed form
    assert e_eu_40 < e_eu_20 and e_he_40 < e_he_20
    # Heun beats Euler at equal step count, and shows ~2nd-order decay
    assert e_he_20 < e_eu_20
    assert e_eu_20 / e_eu_40 > 1.6       # ~2x for order 1
    assert e_he_20 / e_he_40 > 3.0       # ~4x for order 2
    assert e_he_40 < 1e-3


def test_inversion_roundtrip(x_init):
    """sample_inversion is the reverse tape of the same ODE: with the smooth
    Gaussian field, invert(sample(z)) returns z to solver accuracy."""
    model = _gaussian_velocity(0.8)
    fm = FlowMatching(total_steps=1000, respace_steps=200, solver="heun")
    img = fm.sample(model, x_init, jax.random.PRNGKey(0))
    z_rec = fm.sample_inversion(model, img)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(x_init),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# training objective
# ---------------------------------------------------------------------------
def test_loss_func_closed_form(x_init):
    """Zero model => loss = E||eps - x0||^2 with the EXACT eps passed in."""
    fm = FlowMatching(total_steps=1000)
    eps = jnp.asarray(np.random.RandomState(2).randn(*x_init.shape), jnp.float32)
    t = jnp.asarray([0, 250, 500, 999])
    zero_model = lambda x, t, **kw: jnp.zeros_like(x)  # noqa: E731
    loss = fm.loss_func(zero_model, x_init, t, eps=eps)
    want = float(jnp.mean(jnp.square(eps - x_init)))
    assert abs(float(loss) - want) < 1e-5
    # perfect model => zero loss
    perfect = lambda x, tt, **kw: eps - x_init  # noqa: E731
    assert float(fm.loss_func(perfect, x_init, t, eps=eps)) < 1e-10


def test_diffuse_endpoints(x_init):
    fm = FlowMatching(total_steps=1000)
    eps = jnp.asarray(np.random.RandomState(3).randn(*x_init.shape), jnp.float32)
    b = x_init.shape[0]
    x_at_0 = fm.diffuse(x_init, jnp.zeros((b,), jnp.int32), eps)
    np.testing.assert_allclose(np.asarray(x_at_0), np.asarray(x_init), atol=1e-6)
    x_at_T = fm.diffuse(x_init, jnp.full((b,), 1000), eps)
    np.testing.assert_allclose(np.asarray(x_at_T), np.asarray(eps), atol=1e-6)


def test_loss_conditioning_matches_sampling_grid():
    """With time_shift != 1, the model must be conditioned on the SHIFTED
    time in training, matching what the sampler feeds at the same u."""
    fm = FlowMatching(total_steps=1000, time_shift=3.0, respace_steps=4)
    seen = []

    def spy(x, t, **kw):
        seen.append(np.asarray(t))
        return jnp.zeros_like(x)

    x0 = jnp.zeros((2, 4, 4, 1))
    fm.loss_func(spy, x0, jnp.asarray([500, 500]), eps=jnp.zeros_like(x0))
    got_train = seen[0][0] / 1000.0
    want = _shift_u(0.5, 3.0)
    assert abs(got_train - want) < 1e-6
    # sampling grid endpoints stay exact under the shift
    tape = fm.sampler_tape()
    assert tape["u"][0] == 1.0 and tape["u_next"][-1] == 0.0
    assert np.all(np.diff(tape["u"]) < 0)


def test_time_shift_identity():
    a = FlowMatching(respace_steps=8).sampler_tape()
    b = FlowMatching(respace_steps=8, time_shift=1.0).sampler_tape()
    np.testing.assert_array_equal(a["u"], b["u"])
    with pytest.raises(ValueError):
        FlowMatching(time_shift=0.0)
    with pytest.raises(ValueError):
        FlowMatching(solver="rk4")


# ---------------------------------------------------------------------------
# loop plumbing: collect / partial runs / respaced_seq
# ---------------------------------------------------------------------------
def test_sample_loop_collect_and_partial(x_init):
    model = _gaussian_velocity(0.5)
    fm = FlowMatching(total_steps=1000, respace_steps=10)
    full, ys = fm.sample_loop(model, x_init, collect=("sample", "pred_x0"))
    assert ys["sample"].shape == (10,) + x_init.shape
    np.testing.assert_allclose(np.asarray(ys["sample"][-1]), np.asarray(full),
                               atol=1e-6)
    # split run composes: 4 steps then 6 from the intermediate state
    mid, _ = fm.sample_loop(model, x_init, num_steps=4)
    rest, _ = fm.sample_loop(model, mid, start_step=4)
    np.testing.assert_allclose(np.asarray(rest), np.asarray(full), atol=1e-5)
    assert len(fm.respaced_seq) == 10
    assert np.all(np.diff(fm.respaced_seq) > 0)  # ascending like DDPM-family


def test_clip_denoised_path(x_init):
    """With clip off, a huge velocity overshoots; with clip on, the implied
    x0 is boxed to [-1,1] each step."""
    big = lambda x, t, **kw: 10.0 * jnp.ones_like(x)  # noqa: E731
    out_off = FlowMatching(respace_steps=5).sample(big, x_init, None)
    out_on = FlowMatching(respace_steps=5, clip_denoised=True).sample(big, x_init, None)
    assert float(jnp.max(jnp.abs(out_off))) > 2.0
    assert float(jnp.max(jnp.abs(out_on))) <= 1.0 + 1e-4


# ---------------------------------------------------------------------------
# CFG
# ---------------------------------------------------------------------------
def test_cfg_scale_one_equals_cond_only(x_init):
    """s=1 reduces to the conditional model; the velocities are combined as
    (1-s) v_uncond + s v_cond (DDPMCFG convention)."""
    wc = jnp.asarray(np.random.RandomState(4).randn(3, 1), jnp.float32)

    def model(x, t, y=None, **kw):
        # per-class constant velocity: y indexes wc
        return jnp.broadcast_to(wc[y][:, :, None, None], x.shape)

    b = x_init.shape[0]
    y = jnp.asarray([0, 1, 2, 0])
    null = jnp.full((b,), 2)
    cfg1 = FlowMatchingCFG(guidance_scale=1.0, respace_steps=6)
    got = cfg1.sample(model, x_init, None, uncond_conditioning=null,
                      model_kwargs={"y": y})
    plain = FlowMatching(respace_steps=6).sample(
        lambda x, t, **kw: model(x, t, y=y), x_init, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain), atol=1e-5)

    # s=2: velocity must equal 2 v_cond - v_uncond => closed-form landing
    cfg2 = FlowMatchingCFG(guidance_scale=2.0, respace_steps=6)
    got2 = cfg2.sample(model, x_init, None, uncond_conditioning=null,
                       model_kwargs={"y": y})
    v_cond = jnp.broadcast_to(wc[y][:, :, None, None], x_init.shape)
    v_unc = jnp.broadcast_to(wc[null][:, :, None, None], x_init.shape)
    want2 = x_init - (2.0 * v_cond - 1.0 * v_unc)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_cfg_one_batched_call(x_init):
    """Each velocity evaluation is ONE 2B-batched model call."""
    calls = []

    def model(x, t, y=None, **kw):
        calls.append(x.shape[0])
        return jnp.zeros_like(x)

    b = x_init.shape[0]
    cfg = FlowMatchingCFG(guidance_scale=2.0, respace_steps=3)
    cfg.sample(model, x_init, None,
               uncond_conditioning=jnp.zeros((b,), jnp.int32),
               model_kwargs={"y": jnp.zeros((b,), jnp.int32)})
    assert calls and all(n == 2 * b for n in calls)


def test_cfg_missing_cond_errors(x_init):
    cfg = FlowMatchingCFG(guidance_scale=2.0, respace_steps=2)
    with pytest.raises(ValueError, match="not found"):
        cfg.sample(lambda x, t, **kw: x, x_init, None,
                   uncond_conditioning=jnp.zeros((4,), jnp.int32))
    with pytest.raises(ValueError, match="uncond_conditioning"):
        cfg.sample(lambda x, t, y=None, **kw: x, x_init, None,
                   model_kwargs={"y": jnp.zeros((4,), jnp.int32)})


def test_cfg_guided_inversion_roundtrip(x_init):
    """FlowMatchingCFG.sample_inversion threads uncond_conditioning (review
    fix): at s=1 the guided inversion equals the plain conditional one, and
    invert(sample(z)) round-trips."""
    model = _gaussian_velocity(0.8)

    def cond_model(x, t, y=None, **kw):
        return model(x, t)

    b = x_init.shape[0]
    y = jnp.zeros((b,), jnp.int32)
    null = jnp.ones((b,), jnp.int32)
    cfg = FlowMatchingCFG(guidance_scale=1.0, respace_steps=200, solver="heun")
    img = cfg.sample(cond_model, x_init, None, uncond_conditioning=null,
                     model_kwargs={"y": y})
    z_rec = cfg.sample_inversion(cond_model, img, uncond_conditioning=null,
                                 model_kwargs={"y": y})
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(x_init),
                               rtol=1e-3, atol=1e-3)


def test_diffuse_matches_tape_under_time_shift(x_init):
    """SDEdit-style composition (review fix): diffuse(img, respaced_seq[k])
    must land exactly on the tape's noise level u for ANY time_shift —
    re-shifting the already-shifted respaced_seq would double-shift."""
    fm = FlowMatching(total_steps=1000, respace_steps=8, time_shift=3.0)
    tape = fm.sampler_tape()
    seq = fm.respaced_seq  # ascending model timesteps, shift baked in
    eps = jnp.asarray(np.random.RandomState(6).randn(*x_init.shape), jnp.float32)
    for row in (0, 3, 7):
        # tape row `row` (descending u) corresponds to seq[-1 - row]
        t_edit = jnp.full((x_init.shape[0],), seq[-1 - row], jnp.float32)
        got = fm.diffuse(x_init, t_edit, eps)
        u = float(tape["u"][row])
        want = (1.0 - u) * x_init + u * eps
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_respace_type_quad_and_validation():
    """`quad` densifies the grid near u=0 (review fix: respace_type was a
    silent no-op); the discrete uniform offset variants map to the same
    exact-endpoint grid; unknown types raise at construction."""
    uni = FlowMatching(respace_steps=8).sampler_tape()
    quad = FlowMatching(respace_steps=8, respace_type="quad").sampler_tape()
    assert quad["u"][0] == 1.0 and quad["u_next"][-1] == 0.0
    assert not np.allclose(uni["u"], quad["u"])
    # quad steps shrink toward the data end: |du| decreasing
    du = np.abs(np.diff(np.concatenate([quad["u"][:1], quad["u_next"]])))
    assert np.all(np.diff(du) < 0)
    for rt in ("uniform-leading", "uniform-trailing", "uniform2", "linspace"):
        np.testing.assert_array_equal(
            FlowMatching(respace_steps=8, respace_type=rt).sampler_tape()["u"],
            uni["u"])
    with pytest.raises(ValueError, match="respace_type"):
        FlowMatching(respace_type="exponential")


def test_cli_flow_solver_defers_to_config():
    """--flow_solver default must NOT clobber a config's solver (review
    fix); an explicit flag still wins."""
    import importlib
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(repo, "scripts") not in sys.path:
        sys.path.insert(0, os.path.join(repo, "scripts"))
    sample_uncond = importlib.import_module("sample_uncond")
    from dmtpu.utils.config import Config

    parser = sample_uncond.get_parser()
    conf = Config({"diffusion": {"params": {"solver": "heun", "respace_steps": 5}}})
    args = parser.parse_args(
        ["-c", "x.yaml", "--n_samples", "1", "--weights", "w", "--save_dir", "s",
         "--sampler", "flow"])
    assert sample_uncond.build_diffuser(args, conf).solver == "heun"
    args2 = parser.parse_args(
        ["-c", "x.yaml", "--n_samples", "1", "--weights", "w", "--save_dir", "s",
         "--sampler", "flow", "--flow_solver", "euler"])
    assert sample_uncond.build_diffuser(args2, conf).solver == "euler"


# ---------------------------------------------------------------------------
# train-step seam
# ---------------------------------------------------------------------------
def test_flow_trains_through_make_diffusion_loss_fn():
    """The flow objective drops into the standard train step unchanged and
    the loss decreases on a tiny overfit task."""
    import optax

    from dmtpu.parallel.train import make_diffusion_loss_fn

    class TinyNet:
        """Linear-in-x model with learnable per-pixel scale/bias."""

        def init(self, rng, x, t):
            return {"w": jnp.zeros((4, 4, 1)), "b": jnp.zeros((4, 4, 1))}

        def apply(self, params, x, t, rngs=None, **kw):
            return params["w"] * x + params["b"]

    model = TinyNet()
    fm = FlowMatching(total_steps=1000)
    loss_fn = make_diffusion_loss_fn(fm, model.apply, total_steps=1000)
    x0 = jnp.asarray(np.random.RandomState(5).rand(16, 4, 4, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, None)
    opt = optax.adam(1e-1)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, x0, rng)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
