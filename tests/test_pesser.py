"""pesser UNet: conversion + numerical parity vs the reference torch model."""
import numpy as np

import jax
import jax.numpy as jnp

from dmtpu.convert import convert_by_structure
from dmtpu.models.pesser import PesserUNet
from tests.conftest import require_reference

CFG = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=2,
           attn_resolutions=[8], in_channels=3, resolution=16, dropout=0.0)


def test_pesser_conversion_and_forward_parity():
    require_reference()
    import torch
    from models.pesser.model import Model as RefModel

    torch.manual_seed(0)
    ref = RefModel(**CFG)
    ref.eval()

    model = PesserUNet(**CFG)
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([3, 77])

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(t))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_by_structure(sd, init)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pesser_conversion_rejects_wrong_arch():
    require_reference()
    import pytest
    import torch
    from models.pesser.model import Model as RefModel

    ref = RefModel(**CFG)
    model = PesserUNet(**{**CFG, "ch_mult": (1, 2, 2)})  # different depth
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with pytest.raises(ValueError):
        convert_by_structure(sd, init)
