"""Gradient checkpointing (``use_checkpoint`` → jax.checkpoint).

The flag must (a) leave the param tree and gradients bitwise identical and
(b) actually reduce compiled peak temp memory of the backward pass
(reference semantics: models/adm/nn.py:124-170).
"""
import jax
import jax.numpy as jnp
import pytest

from dmtpu.models.adm import UNetModel
from dmtpu.models.stablediffusion.unet import SDUNetModel

CPU = jax.devices("cpu")[0]


def _adm(ckpt):
    return UNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True, use_checkpoint=ckpt)


def _sd(ckpt):
    return SDUNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=16, use_checkpoint=ckpt)


def _grads(model, params, args):
    def loss(p):
        return (model.apply(p, *args) ** 2).mean()

    return jax.grad(loss)(params)


@pytest.mark.parametrize("family", ["adm", "sd"])
def test_checkpoint_grads_identical(family):
    with jax.default_device(CPU):
        if family == "adm":
            m0, m1 = _adm(False), _adm(True)
            args = (jnp.ones((2, 16, 16, 3)), jnp.array([3, 7]))
        else:
            m0, m1 = _sd(False), _sd(True)
            args = (jnp.ones((2, 16, 16, 4)), jnp.array([3, 7]),
                    jnp.ones((2, 5, 16)))
        p0 = m0.init(jax.random.PRNGKey(0), *args)
        p1 = m1.init(jax.random.PRNGKey(0), *args)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        g0, g1 = _grads(m0, p0, args), _grads(m1, p1, args)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
        assert max(jax.tree.leaves(diffs)) == 0.0


def test_checkpoint_reduces_peak_memory():
    """Compiled temp-memory of grad(loss) must shrink with remat on."""
    with jax.default_device(CPU):
        x = jnp.ones((4, 32, 32, 3))
        t = jnp.arange(4)

        def temp_bytes(ckpt):
            model = _adm(ckpt)
            params = model.init(jax.random.PRNGKey(0), x, t)

            def loss(p):
                return (model.apply(p, x, t) ** 2).mean()

            compiled = jax.jit(jax.grad(loss)).lower(params).compile()
            return compiled.memory_analysis().temp_size_in_bytes

        assert temp_bytes(True) < temp_bytes(False)


def test_use_fp16_maps_to_bf16_torso():
    """fp16 torso configs must actually change compute dtype, not no-op
    (reference: models/adm/unet.py:21-38)."""
    with jax.default_device(CPU):
        x = jnp.ones((1, 16, 16, 3))
        t = jnp.array([5])
        model = UNetModel(image_size=16, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1,),
                          use_fp16=True)
        params = model.init(jax.random.PRNGKey(0), x, t)
        hlo = jax.jit(model.apply).lower(params, x, t).as_text()
        assert "bf16" in hlo


def test_selective_remat_policy_grads_identical():
    """use_checkpoint='dots' (selective remat, dmtpu/ops/rematerialize.py)
    gives bit-identical grads to no-remat on DiT and the SD UNet."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmtpu.models.dit import dit_model

    x = jnp.ones((2, 8, 8, 4)) * 0.1
    t = jnp.arange(2)
    y = jnp.arange(2)
    m_plain = dit_model("DiT-S/2", input_size=8, num_classes=10)
    m_dots = dit_model("DiT-S/2", input_size=8, num_classes=10,
                       use_checkpoint="dots")
    p = m_plain.init(jax.random.PRNGKey(0), x, t, y)

    g_plain = jax.jit(jax.grad(lambda pp: jnp.mean(m_plain.apply(pp, x, t, y) ** 2)))(p)
    g_dots = jax.jit(jax.grad(lambda pp: jnp.mean(m_dots.apply(pp, x, t, y) ** 2)))(p)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    from dmtpu.ops.rematerialize import normalize_use_checkpoint

    assert normalize_use_checkpoint(True) == (True, None)
    assert normalize_use_checkpoint(False) == (False, None)
    on, pol = normalize_use_checkpoint("dots")
    assert on and pol is jax.checkpoint_policies.dots_saveable
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown checkpoint policy"):
        normalize_use_checkpoint("bogus")


def test_selective_remat_policy_mdt_and_kid_guards():
    """MDT honours policy strings too (not silently full-remat), and the
    KID estimator rejects degenerate sets instead of emitting inf."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from dmtpu.models.mdt import MDTv2

    x = jnp.ones((2, 8, 8, 4)) * 0.1
    t = jnp.arange(2)
    y = jnp.arange(2)
    kw = dict(input_size=8, patch_size=2, hidden_size=32, depth=2, num_heads=2,
              num_classes=10, decode_layer=1)
    m_plain = MDTv2(**kw)
    m_dots = MDTv2(use_checkpoint="dots", **kw)
    p = m_plain.init(jax.random.PRNGKey(0), x, t, y)
    g0 = jax.jit(jax.grad(lambda pp: jnp.mean(m_plain.apply(pp, x, t, y) ** 2)))(p)
    g1 = jax.jit(jax.grad(lambda pp: jnp.mean(m_dots.apply(pp, x, t, y) ** 2)))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    with pytest.raises(ValueError, match="unknown checkpoint policy"):
        MDTv2(use_checkpoint="bogus", **kw).apply(p, x, t, y)

    from dmtpu.eval.fid import polynomial_mmd2

    with pytest.raises(ValueError, match=">= 2 samples"):
        polynomial_mmd2(np.zeros((1, 4)), np.zeros((5, 4)))


def test_attn_named_remat_policy_grads_identical():
    """use_checkpoint='attn' (round 4: save_only_these_names over the
    checkpoint_name('attn_out') tags in CrossAttention/AttentionBlock) gives
    the same grads as full remat on the SD UNet, and resolves correctly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmtpu.models.stablediffusion.unet import SDUNetModel
    from dmtpu.ops.rematerialize import normalize_use_checkpoint

    kw = dict(in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
              num_heads=4, use_spatial_transformer=True, transformer_depth=1,
              context_dim=16, legacy=False)
    m_full = SDUNetModel(use_checkpoint=True, **kw)
    m_attn = SDUNetModel(use_checkpoint="attn", **kw)
    x = jnp.ones((2, 8, 8, 4)) * 0.1
    t = jnp.arange(2)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 16))
    p = m_full.init(jax.random.PRNGKey(0), x, t, ctx)

    g_full = jax.jit(jax.grad(
        lambda pp: jnp.mean(m_full.apply(pp, x, t, ctx) ** 2)))(p)
    g_attn = jax.jit(jax.grad(
        lambda pp: jnp.mean(m_attn.apply(pp, x, t, ctx) ** 2)))(p)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_attn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    on, pol = normalize_use_checkpoint("attn")
    assert on and pol is not None
