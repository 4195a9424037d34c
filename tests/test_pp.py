"""Pipeline parallelism (dmtpu/parallel/pp.py) on the 8-device CPU mesh:
GPipe schedule numerics vs the plain forward, gradients through the
pipeline, microbatch counts, stacking helper, and guards."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.models.dit import DiT, dit_model
from dmtpu.parallel.mesh import make_mesh
from dmtpu.parallel.pp import (
    dit_pipeline_forward,
    pipeline_apply,
    stack_block_params,
)


def _mesh(fsdp):
    devs = jax.devices("cpu")
    assert len(devs) == 8
    return make_mesh(devs, fsdp=fsdp)


@pytest.fixture(scope="module")
def tiny_dit():
    m = dit_model("DiT-S/2", input_size=8, num_classes=10, learn_sigma=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 4))
    t = jnp.arange(8)
    y = jnp.arange(8) % 10
    p = m.init(jax.random.PRNGKey(1), x, t, y)
    # perturb: the final layer is zero-init, grads would vanish otherwise
    leaves, td = jax.tree.flatten(p)
    leaves = [l + 0.02 * jax.random.normal(jax.random.PRNGKey(90 + i), l.shape, l.dtype)
              for i, l in enumerate(leaves)]
    return m, jax.tree.unflatten(td, leaves), (x, t, y)


def test_stack_block_params(tiny_dit):
    m, p, _ = tiny_dit
    stacked, rest, n = stack_block_params(p)
    assert n == m.depth == 12
    lead = {l.shape[0] for l in jax.tree.leaves(stacked)}
    assert lead == {12}
    assert not any(k.startswith("blocks__") for k in rest["params"])
    assert "final_layer" in rest["params"]


@pytest.mark.parametrize("fsdp,mb", [(2, None), (4, None), (4, 8)])
def test_pipeline_matches_plain_forward(tiny_dit, fsdp, mb):
    m, p, (x, t, y) = tiny_dit
    want = m.apply(p, x, t, y)
    mesh = _mesh(fsdp)
    got = dit_pipeline_forward(m, p, x, t, y, mesh=mesh, n_microbatches=mb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6, rtol=1e-5)


def test_pipeline_dp_composition(tiny_dit):
    """dp × pp in one shard_map: microbatches sharded over 'data' while the
    block stack streams over 'fsdp' — numerics and grads == plain forward."""
    m, p, (x, t, y) = tiny_dit
    mesh = _mesh(4)  # data=2, fsdp=4
    assert mesh.shape["data"] == 2
    want = m.apply(p, x, t, y)
    got = dit_pipeline_forward(m, p, x, t, y, mesh=mesh, n_microbatches=2,
                               dp_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6, rtol=1e-5)

    def loss_pp(pp_):
        return jnp.mean(dit_pipeline_forward(m, pp_, x, t, y, mesh=mesh,
                                             n_microbatches=2,
                                             dp_axis="data") ** 2)

    g_pp = jax.device_get(jax.jit(jax.grad(loss_pp))(p))
    g_ref = jax.device_get(jax.jit(jax.grad(
        lambda pp_: jnp.mean(m.apply(pp_, x, t, y) ** 2)))(p))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)

    with pytest.raises(ValueError, match="must differ"):
        dit_pipeline_forward(m, p, x, t, y, mesh=mesh, dp_axis="fsdp")


def test_pipeline_gradients_match_plain(tiny_dit):
    """jax.grad through the GPipe schedule == grads of the plain forward."""
    m, p, (x, t, y) = tiny_dit
    mesh = _mesh(4)

    def loss_pp(pp_):
        return jnp.mean(dit_pipeline_forward(m, pp_, x, t, y, mesh=mesh) ** 2)

    def loss_ref(pp_):
        return jnp.mean(m.apply(pp_, x, t, y) ** 2)

    g_pp = jax.device_get(jax.jit(jax.grad(loss_pp))(p))
    g_ref = jax.device_get(jax.jit(jax.grad(loss_ref))(p))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


def test_pipeline_guards(tiny_dit):
    m, p, (x, t, y) = tiny_dit
    mesh = _mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        dit_pipeline_forward(m, p, x[:6], t[:6], y[:6], mesh=mesh,
                             n_microbatches=4)
    stacked, _, _ = stack_block_params(p)
    with pytest.raises(ValueError, match="no consecutive"):
        stack_block_params({"params": {"final": jnp.zeros((1,))}})
    # 12 layers over 8 stages does not divide
    mesh8 = make_mesh(jax.devices("cpu"), fsdp=8)

    def block_fn(lp, h, c):
        return h

    tokens = jnp.zeros((8, 16, 384))
    cond = jnp.zeros((8, 384))
    with pytest.raises(ValueError, match="layers not divisible"):
        pipeline_apply(stacked, tokens, cond, block_fn, mesh8, axis="fsdp")


def test_dit_embed_head_seams(tiny_dit):
    """embed -> blocks -> head composition equals __call__ exactly."""
    m, p, (x, t, y) = tiny_dit
    from dmtpu.models.dit import DiTBlock

    tokens, c = m.apply(p, x, t, y, method=DiT.embed)
    for i in range(m.depth):
        tokens = DiTBlock(m.num_heads, m.mlp_ratio).apply(
            {"params": p["params"][f"blocks__{i}"]}, tokens, c)
    out = m.apply(p, tokens, c, method=DiT.head)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(p, x, t, y)))
