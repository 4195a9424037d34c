"""ADM UNet family: conversion + numerical parity vs the reference torch model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.convert import convert_by_structure
from dmtpu.models.adm import EncoderUNetModel, UNetModel
from tests.conftest import require_reference

BASE = dict(image_size=16, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=2, attention_resolutions=[2], dropout=0.0,
            channel_mult=(1, 2), num_head_channels=16)


def _convert(ref, model, init):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return convert_by_structure(sd, init)


@pytest.mark.parametrize("extra", [
    dict(),                                            # plain additive embed
    dict(use_scale_shift_norm=True, resblock_updown=True),
    dict(use_new_attention_order=True),
    dict(num_classes=10, use_scale_shift_norm=True),
    dict(out_channels=6),                              # learned-range variance
])
def test_adm_unet_parity(extra):
    require_reference()
    import torch
    from models.adm.unet import UNetModel as RefUNet

    cfg = {**BASE, **extra}
    torch.manual_seed(0)
    ref = RefUNet(**cfg)
    ref.eval()
    # zero_module leaves them 0 — randomise so parity is non-trivial
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    model = UNetModel(**cfg)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([3, 777])
    y = np.array([1, 7]) if cfg.get("num_classes") else None

    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    args = (x_j, jnp.asarray(t)) + ((jnp.asarray(y),) if y is not None else ())
    init = model.init(jax.random.PRNGKey(0), *args)
    params = _convert(ref, model, init)

    with torch.no_grad():
        targs = (torch.from_numpy(x), torch.from_numpy(t)) + (
            (torch.from_numpy(y),) if y is not None else ())
        want = ref(*targs).numpy()
    got = np.transpose(np.asarray(model.apply(params, *args)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_adm_encoder_parity(pool):
    require_reference()
    import torch
    from models.adm.unet import EncoderUNetModel as RefEnc

    cfg = {**BASE, "out_channels": 5, "pool": pool}
    torch.manual_seed(0)
    ref = RefEnc(**cfg)
    ref.eval()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    model = EncoderUNetModel(**cfg)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([5, 42])
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t))
    params = _convert(ref, model, init)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = np.asarray(model.apply(params, x_j, jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4, err_msg=pool)


def test_combine_adm_weights_parity():
    """combine_weights equivalent: two torch ADM checkpoints fuse into one
    UNetCombined tree (reference: models/adm/unet_combined.py:27-32), with
    cond/uncond routing matching the torch module."""
    require_reference()
    import torch
    from models.adm.unet import UNetModel as RefUNet

    from dmtpu.convert.zoo import combine_adm_weights
    from dmtpu.models.adm import UNetCombined

    cfg = {**BASE, "num_classes": 10, "use_scale_shift_norm": True}
    cfg_uncond = {**cfg, "num_classes": None}

    def make_ref(c, seed):
        torch.manual_seed(seed)
        ref = RefUNet(**c)
        ref.eval()
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if p.abs().sum() == 0:
                    p.add_(torch.randn_like(p) * 0.02)
        return ref

    ref_cond = make_ref(cfg, 0)
    ref_uncond = make_ref(cfg_uncond, 1)
    cond_sd = {k: v.detach().numpy() for k, v in ref_cond.state_dict().items()}
    uncond_sd = {k: v.detach().numpy() for k, v in ref_uncond.state_dict().items()}

    model = UNetCombined(unet_kwargs=cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([3, 88])
    y = np.array([1, 7])
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), jnp.asarray(y))
    params = combine_adm_weights(cond_sd, uncond_sd, init)

    with torch.no_grad():
        want_c = ref_cond(torch.from_numpy(x), torch.from_numpy(t),
                          torch.from_numpy(y)).numpy()
        want_u = ref_uncond(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    got_c = np.transpose(np.asarray(model.apply(
        params, x_j, jnp.asarray(t), jnp.asarray(y))), (0, 3, 1, 2))
    got_u = np.transpose(np.asarray(model.apply(
        params, x_j, jnp.asarray(t), None)), (0, 3, 1, 2))
    np.testing.assert_allclose(got_c, want_c, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_u, want_u, rtol=2e-4, atol=2e-4)
