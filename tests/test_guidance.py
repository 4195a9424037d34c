"""Guidance parity vs the reference oracle (zero reverse noise on both sides)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.diffusions.guidance import ILVR, BaseGuidance, MaskGuidance
from tests.conftest import require_reference
from tests.test_samplers import KW, _zero_noise, jx_model, nhwc, pt_model


def test_resize_right_parity():
    require_reference()
    import torch
    from utils.resize_right import resize_right as ref_rr
    from utils.resize_right import interp_methods as ref_im

    from dmtpu.ops.resize_right import resize

    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)
    for method in ["cubic", "lanczos2", "lanczos3", "linear", "box"]:
        for scale in [0.125, 0.5, 2.0, 8.0, 0.3]:
            want = ref_rr.resize(
                torch.from_numpy(x), scale_factors=scale,
                interp_method=getattr(ref_im, method),
            ).numpy()
            got = resize(jnp.asarray(nhwc(x)), scale_factors=scale, interp_method=method)
            got = np.transpose(np.asarray(got), (0, 3, 1, 2))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                       err_msg=f"{method} scale={scale}")


def test_ilvr_low_pass_filter_parity():
    require_reference()
    import torch
    from diffusions.guidance.ilvr import ILVR as RefILVR

    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)

    ref = RefILVR(downsample_factor=8, **KW)
    want = ref.low_pass_filter(torch.from_numpy(x)).numpy()

    ours = ILVR(downsample_factor=8, **KW)
    got = np.transpose(np.asarray(ours.low_pass_filter(jnp.asarray(nhwc(x)))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ilvr_sampling_parity(monkeypatch):
    require_reference()
    import torch
    from diffusions.guidance.ilvr import ILVR as RefILVR

    _zero_noise(monkeypatch)
    rs = np.random.RandomState(2)
    init = rs.randn(2, 3, 32, 32).astype(np.float32)
    ref_imgs = rs.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    ref = RefILVR(ref_images=torch.from_numpy(ref_imgs), downsample_factor=4, **KW)
    want = ref.sample(pt_model, torch.from_numpy(init)).numpy()

    ours = ILVR(ref_images=jnp.asarray(nhwc(ref_imgs)), downsample_factor=4, **KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=2e-3, atol=2e-3)


def test_mask_guidance_sampling_parity(monkeypatch):
    require_reference()
    import torch
    from diffusions.guidance.mask_guidance import MaskGuidance as RefMask

    _zero_noise(monkeypatch)
    rs = np.random.RandomState(3)
    init = rs.randn(2, 3, 16, 16).astype(np.float32)
    img = rs.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    mask = (rs.rand(2, 1, 16, 16) > 0.5).astype(np.float32)

    ref = RefMask(masked_image=torch.from_numpy(img), mask=torch.from_numpy(mask), **KW)
    want = ref.sample(pt_model, torch.from_numpy(init)).numpy()

    ours = MaskGuidance(masked_image=jnp.asarray(nhwc(img)), mask=jnp.asarray(nhwc(mask)), **KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("r,j", [(1, 10), (5, 10), (10, 10), (3, 2)])
def test_repaint_schedule_parity(r, j):
    require_reference()
    import torch
    from diffusions.guidance.mask_guidance import MaskGuidance as RefMask

    kw = dict(total_steps=1000, respace_type="uniform", respace_steps=250)
    ref = RefMask(**kw)
    ours = MaskGuidance(**kw)
    assert ours.get_resample_seq(r, j) == ref.get_resample_seq(r, j)


def test_repaint_resample_parity(monkeypatch):
    require_reference()
    import torch
    from diffusions.guidance.mask_guidance import MaskGuidance as RefMask

    _zero_noise(monkeypatch)
    rs = np.random.RandomState(4)
    init = rs.randn(1, 3, 16, 16).astype(np.float32)
    img = rs.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32)
    mask = (rs.rand(1, 1, 16, 16) > 0.5).astype(np.float32)
    kw = dict(total_steps=100, respace_type="uniform", respace_steps=25)

    ref = RefMask(masked_image=torch.from_numpy(img), mask=torch.from_numpy(mask), **kw)
    want = ref.resample(pt_model, torch.from_numpy(init), resample_r=3, resample_j=5).numpy()

    ours = MaskGuidance(masked_image=jnp.asarray(nhwc(img)), mask=jnp.asarray(nhwc(mask)), **kw)
    got = ours.resample(jx_model, jnp.asarray(nhwc(init)), jax.random.PRNGKey(0),
                        resample_r=3, resample_j=5)
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=2e-3, atol=2e-3)


class _EpsShift(BaseGuidance):
    def cond_fn_eps(self, out, xt, c, rng):
        return 0.1 * jnp.ones_like(out["pred_eps"])


class _RefEpsShift:
    pass


def test_base_guidance_eps_hook_parity(monkeypatch):
    """A constant eps-shift guidance matches the reference hook plumbing."""
    require_reference()
    import torch
    from diffusions.guidance.base import BaseGuidance as RefBase

    class RefEpsShift(RefBase):
        def cond_fn_eps(self, pred_eps, **kwargs):
            return 0.1 * torch.ones_like(pred_eps)

    _zero_noise(monkeypatch)
    rs = np.random.RandomState(5)
    init = rs.randn(2, 3, 8, 8).astype(np.float32)

    ref = RefEpsShift(**KW)
    want = ref.sample(pt_model, torch.from_numpy(init)).numpy()

    ours = _EpsShift(**KW)
    got = ours.sample(jx_model, jnp.asarray(nhwc(init)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), rtol=2e-3, atol=2e-3)
