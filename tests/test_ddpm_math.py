"""Parity of DDPM q/p math and single denoise steps vs the reference oracle.

Our arrays are NHWC; the reference is NCHW — tests transpose at the boundary.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions import DDPM
from tests.conftest import require_reference


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.fixture(scope="module")
def pair():
    require_reference()
    import torch  # noqa
    from diffusions.ddpm import DDPM as RefDDPM

    ours = DDPM(total_steps=1000, objective="pred_eps", var_type="fixed_large")
    ref = RefDDPM(total_steps=1000, objective="pred_eps", var_type="fixed_large")
    return ours, ref


def test_diffuse_matches(pair):
    import torch
    ours, ref = pair
    rs = np.random.RandomState(0)
    x0 = rs.randn(4, 3, 8, 8).astype(np.float32)
    eps = rs.randn(4, 3, 8, 8).astype(np.float32)
    t = np.array([0, 17, 500, 999])

    got = ours.diffuse(jnp.asarray(nhwc(x0)), jnp.asarray(t), jnp.asarray(nhwc(eps)))
    want = ref.diffuse(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(eps)).numpy()
    np.testing.assert_allclose(nchw(np.asarray(got)), want, rtol=2e-5, atol=2e-6)


def test_conversions_match(pair):
    import torch
    ours, ref = pair
    rs = np.random.RandomState(1)
    xt = rs.randn(2, 3, 8, 8).astype(np.float32)
    other = rs.randn(2, 3, 8, 8).astype(np.float32)
    for t in [0, 1, 250, 999]:
        for name in ["pred_x0_from_eps", "pred_eps_from_x0", "pred_x0_from_v", "pred_eps_from_v"]:
            got = getattr(ours, name)(jnp.asarray(nhwc(xt)), t, jnp.asarray(nhwc(other)))
            want = getattr(ref, name)(torch.from_numpy(xt), t, torch.from_numpy(other)).numpy()
            np.testing.assert_allclose(nchw(np.asarray(got)), want, rtol=2e-4, atol=2e-4,
                                       err_msg=f"{name} t={t}")


def test_get_v_matches(pair):
    import torch
    ours, ref = pair
    rs = np.random.RandomState(2)
    x0 = rs.randn(3, 3, 4, 4).astype(np.float32)
    eps = rs.randn(3, 3, 4, 4).astype(np.float32)
    t = np.array([5, 300, 900])
    got = ours.get_v(jnp.asarray(nhwc(x0)), jnp.asarray(nhwc(eps)), jnp.asarray(t))
    want = ref.get_v(torch.from_numpy(x0), torch.from_numpy(eps), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(nchw(np.asarray(got)), want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("var_type,extra_ch", [
    ("fixed_large", 0), ("fixed_small", 0), ("learned_range", 3),
])
@pytest.mark.parametrize("objective", ["pred_eps", "pred_x0", "pred_v"])
def test_denoise_step_matches(var_type, extra_ch, objective):
    """One reverse step: mean / var / pred_x0 / pred_eps vs oracle, at several t."""
    require_reference()
    import torch
    from diffusions.ddpm import DDPM as RefDDPM

    ours = DDPM(total_steps=1000, objective=objective, var_type=var_type,
                respace_type="uniform", respace_steps=50)
    ref = RefDDPM(total_steps=1000, objective=objective, var_type=var_type,
                  respace_type="uniform", respace_steps=50)

    rs = np.random.RandomState(3)
    xt = rs.randn(2, 3, 8, 8).astype(np.float32)
    mo = rs.randn(2, 3 + extra_ch, 8, 8).astype(np.float32)

    tape = ours.sampler_tape()
    seq = list(ours.respaced_seq)
    seq_prev = [-1] + seq[:-1]
    # tape is in sampling (descending-t) order
    for row in [0, 10, len(seq) - 1]:
        c = {k: jnp.asarray(v[row]) for k, v in tape.items()}
        t = int(c["t"])
        i = seq.index(t)
        t_prev = seq_prev[i]

        key = jax.random.PRNGKey(0)
        got = ours.denoise_step(jnp.asarray(nhwc(mo)), jnp.asarray(nhwc(xt)), c, key)
        want = ref.denoise(torch.from_numpy(mo), torch.from_numpy(xt), t, t_prev)

        np.testing.assert_allclose(nchw(np.asarray(got["mean"])), want["mean"].numpy(),
                                   rtol=5e-4, atol=5e-5, err_msg=f"mean t={t}")
        np.testing.assert_allclose(nchw(np.asarray(got["pred_x0"])), want["pred_x0"].numpy(),
                                   rtol=5e-4, atol=5e-5, err_msg=f"pred_x0 t={t}")
        np.testing.assert_allclose(nchw(np.asarray(got["pred_eps"])), want["pred_eps"].numpy(),
                                   rtol=5e-4, atol=2e-4, err_msg=f"pred_eps t={t}")
        want_var = want["var"].numpy()
        got_var = np.asarray(got["var"], dtype=np.float32)
        if got_var.ndim == 4:
            got_var = nchw(got_var)
        np.testing.assert_allclose(got_var, np.broadcast_to(want_var, got_var.shape),
                                   rtol=5e-4, atol=1e-6, err_msg=f"var t={t}")


def test_loss_func_value(pair):
    """Loss equals MSE between model output and the analytic target."""
    ours, _ = pair
    rs = np.random.RandomState(4)
    x0 = jnp.asarray(rs.randn(4, 8, 8, 3).astype(np.float32))
    eps = jnp.asarray(rs.randn(4, 8, 8, 3).astype(np.float32))
    t = jnp.asarray([10, 100, 500, 999])

    def model_fn(xt, tt):
        return 0.5 * xt

    loss = ours.loss_func(model_fn, x0, t, eps=eps)
    xt = ours.diffuse(x0, t, eps)
    expect = jnp.mean((0.5 * xt - eps) ** 2)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
