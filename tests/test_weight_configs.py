"""The reference's per-checkpoint weight YAMLs must instantiate unchanged."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.utils.config import instantiate_from_config, load_config
from tests.conftest import REFERENCE_ROOT, require_reference


def _load(path):
    conf = load_config(path)
    model = instantiate_from_config(conf.model)
    diffuser = instantiate_from_config(conf.diffusion)
    return model, diffuser


def test_sd15_yaml_instantiates():
    require_reference()
    model, diffuser = _load(os.path.join(REFERENCE_ROOT, "weights/stablediffusion/v1-inference.yaml"))
    assert model.unet.context_dim == 768
    assert model.scale_factor == 0.18215
    assert diffuser.total_steps == 1000 and diffuser.objective == "pred_eps"
    # beta schedule is quad with SD's custom range
    np.testing.assert_allclose(diffuser.alphas_cumprod[0], 1 - 0.00085, rtol=1e-6)


def test_sd21_yaml_instantiates():
    require_reference()
    model, diffuser = _load(os.path.join(REFERENCE_ROOT, "weights/stablediffusion/v2-inference-v.yaml"))
    assert model.unet.context_dim == 1024
    assert diffuser.objective == "pred_v"
    # SD2.1 text tower is the open_clip ViT-H penultimate layer
    assert model.text_encoder.model.width == 1024
    assert model.text_encoder.output_layer() == "penultimate"


def test_sdxl_yaml_instantiates():
    require_reference()
    model, diffuser = _load(os.path.join(REFERENCE_ROOT, "weights/sdxl/sd_xl_base.yaml"))
    assert model.unet.context_dim == 2048
    assert model.unet.adm_in_channels == 2816
    assert tuple(model.unet.transformer_depth) == (1, 2, 10)
    assert model.scale_factor == 0.13025
    assert model.conditioner.embed_dim == 256


def test_sdxl_conditioner_shapes():
    """2816 = 1280 pooled + 3 x 2 x 256 size/crop embeds; 2048 = 768 + 1280."""
    from dmtpu.models.sdxl import SDXLConditioner

    from dmtpu.models.stablediffusion import CLIPTextTransformer

    # tiny towers for speed
    cond = SDXLConditioner()
    cond.clip_l = CLIPTextTransformer(layers=2, width=32, heads=2, vocab_size=64)
    cond.clip_g = CLIPTextTransformer(layers=2, width=48, heads=2, vocab_size=64,
                                      act="gelu", projection_dim=48)
    params = cond.init(jax.random.PRNGKey(0))
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 1].set(5)
    size = jnp.asarray([[1024, 1024]] * 2)
    crossattn, vec = cond(params, ids, ids, size, size * 0, size)
    assert crossattn.shape == (2, 77, 32 + 48)
    assert vec.shape == (2, 48 + 3 * 2 * 256)

    c, uc = cond.get_unconditional_conditioning(params, ids, ids, ids, ids, size, size * 0, size)
    assert float(jnp.abs(uc[0]).sum()) == 0.0  # text zeroed
    assert float(jnp.abs(uc[1][:, :48]).sum()) == 0.0  # pooled zeroed
    assert float(jnp.abs(uc[1][:, 48:]).sum()) > 0  # size embeds kept


def test_pretrained_weight_yamls_all_parse():
    """Every weights/**.yaml in the reference parses and resolves targets."""
    require_reference()
    count = 0
    for path in glob.glob(os.path.join(REFERENCE_ROOT, "weights", "**", "*.yaml"), recursive=True):
        conf = load_config(path)
        if "model" not in conf:
            continue
        from dmtpu.utils.config import resolve_target

        try:
            resolve_target(conf.model.target)
            count += 1
        except Exception as e:
            pytest.fail(f"{path}: cannot resolve {conf.model.target}: {e}")
    assert count >= 10
