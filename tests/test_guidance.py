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


def test_repaint_collect_contract_is_loud():
    """Regression: resample_loop used to silently drop non-'sample' collect
    keys; it must raise instead."""
    from dmtpu.diffusions.guidance.mask_guidance import MaskGuidance

    g = MaskGuidance(total_steps=10)
    g.set_mask_and_image(jnp.ones((1, 8, 8, 1)), jnp.zeros((1, 8, 8, 3)))
    with pytest.raises(ValueError, match="renoise"):
        g.resample_loop(lambda x, t: 0.01 * x, jnp.zeros((1, 8, 8, 3)),
                        jax.random.PRNGKey(0), collect=("pred_x0",))


def test_clip_guidance_from_pretrained_branch(tmp_path):
    """The constructor branch real users hit: FlaxCLIPModel + CLIPTokenizer
    loaded from a LOCAL directory (tiny random-init fixture), then set_text
    and a short guided sampling run end-to-end
    (reference: diffusions/guidance/clip_guidance.py:38-50)."""
    from dmtpu.diffusions.guidance.clip_guidance import CLIPGuidance
    from tests._tiny_fixtures import make_tiny_clip_dir

    clip_dir = make_tiny_clip_dir(tmp_path / "clip")

    def run(weight):
        g = CLIPGuidance(guidance_weight=weight, clip_pretrained=clip_dir,
                         image_size=64, total_steps=10)
        g.set_text("a cat")
        assert g.text_embed.shape == (1, 16)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(g.text_embed)), 1.0, rtol=1e-5)
        rs = np.random.RandomState(0)
        init = jnp.asarray(rs.randn(1, 8, 8, 3).astype(np.float32))
        out = g.sample(lambda x, t, **kw: 0.05 * x, init, jax.random.PRNGKey(0))
        assert out.shape == init.shape
        assert np.isfinite(np.asarray(out)).all()
        return np.asarray(out)

    guided, unguided = run(5.0), run(0.0)
    assert not np.allclose(guided, unguided)  # guidance shifts the trajectory


def test_clip_guidance_grad_wrt_pixel_values():
    """The guidance delta must equal w·sqrt(1/ᾱ)·var·resize(dL/d pixel_values)
    — NOT the gradient through the preprocessing chain, whose ~0.5/std
    per-channel adjoint silently rescales tuned guidance weights
    (reference: diffusions/guidance/clip_guidance.py:42-50)."""
    from dmtpu.diffusions.guidance.clip_guidance import (
        CLIPGuidance, _CLIP_MEAN, _CLIP_STD)

    rs = np.random.RandomState(0)
    W = jnp.asarray(rs.randn(3 * 8 * 8, 4).astype(np.float32))
    img_fn = lambda px: px.reshape(px.shape[0], -1) @ W  # noqa: E731
    g = CLIPGuidance(
        guidance_weight=2.0, image_size=8,
        text_features_fn=lambda i, m: None, image_features_fn=img_fn,
        tokenizer=object(), total_steps=10)
    v = jnp.asarray(rs.randn(1, 4).astype(np.float32))
    g.set_text_embed(v)

    x0 = jnp.asarray(rs.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1)
    out = {"pred_x0": x0, "var": jnp.float32(0.25)}
    c = {"sqrt_recip_ac": jnp.float32(1.5)}
    got = g.cond_fn_mean(out, x0, c, jax.random.PRNGKey(0))

    # independent reference-style computation: preprocess forward, grad wrt
    # the preprocessed pixel values only (8x8 -> identity resize here)
    px = jnp.transpose(((x0 + 1) / 2 - _CLIP_MEAN) / _CLIP_STD, (0, 3, 1, 2))
    vn = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def sim(p):
        f = img_fn(p)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        return jnp.sum(f @ vn.T)

    want = 2.0 * 1.5 * 0.25 * jnp.transpose(jax.grad(sim)(px), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
