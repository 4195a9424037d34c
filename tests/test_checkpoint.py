"""Checkpoint round-trip: save → restore → resume == uninterrupted.

Covers the reference's resume semantics (reference: scripts/train_ddpm.py:
123-156, utils/misc.py:53-68) at suite level, including under an fsdp-sharded
8-CPU mesh with restore onto a FRESH mesh — exercising the sharded-native
orbax path (no host gather on save, per-leaf target shardings on restore).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from dmtpu.utils import checkpoint as ckpt_lib
from dmtpu.utils import optim as optim_lib

CPUS = jax.devices("cpu")


def _params(key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {"w": jax.random.normal(k1, (16, 8)) * 0.1, "b": jnp.zeros((8,))}


def _loss_fn(p, batch, rng):
    return jnp.mean((batch @ p["w"] + p["b"]) ** 2)


def _tree_equal(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.abs(jnp.asarray(x, jnp.float32)
                                   - jnp.asarray(y, jnp.float32)).max()), a, b)
    return max(jax.tree.leaves(diffs), default=0.0)


def _batch(i):
    return jax.random.normal(jax.random.PRNGKey(100 + i), (8, 16))


def test_roundtrip_resume_equals_uninterrupted(tmp_path):
    tx = optim_lib.adam(lr=1e-2)
    step_fn = make_train_step(_loss_fn, tx, clip_grad_norm=1.0)

    state = TrainState.create(_params(), tx, ema_decay=0.99)
    for i in range(2):
        state, _ = step_fn(state, _batch(i), jax.random.PRNGKey(i))
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), int(state.step), state)
    cont, _ = step_fn(state, _batch(2), jax.random.PRNGKey(2))  # uninterrupted

    fresh = TrainState.create(_params(key=7), tx, ema_decay=0.99)  # different init
    restored = ckpt_lib.load_checkpoint(path, fresh)
    assert int(restored.step) == 2
    assert _tree_equal(restored.params, state.params) == 0.0
    assert _tree_equal(restored.ema.shadow, state.ema.shadow) == 0.0
    resumed, _ = step_fn(restored, _batch(2), jax.random.PRNGKey(2))
    assert _tree_equal(resumed.params, cont.params) == 0.0
    assert _tree_equal(resumed.opt_state, cont.opt_state) == 0.0
    assert _tree_equal(resumed.ema.shadow, cont.ema.shadow) == 0.0


@pytest.mark.skipif(len(CPUS) < 8, reason="needs 8 CPU devices")
def test_roundtrip_fsdp_sharded_fresh_mesh(tmp_path):
    """Save a state sharded over (data=2, fsdp=4); restore onto a FRESH mesh
    object with target shardings; resume one step == uninterrupted."""
    tx = optim_lib.adam(lr=1e-2)
    mesh = make_mesh(CPUS[:8], fsdp=4)
    step_fn = make_train_step(_loss_fn, tx, mesh=mesh)

    state = shard_train_state(TrainState.create(_params(), tx, ema_decay=0.99), mesh)
    state, _ = step_fn(state, shard_batch(_batch(0), mesh), jax.random.PRNGKey(0))
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), int(state.step), state)
    cont, _ = step_fn(state, shard_batch(_batch(1), mesh), jax.random.PRNGKey(1))

    mesh2 = make_mesh(CPUS[:8], fsdp=4)  # fresh mesh, as after a restart
    fresh = shard_train_state(TrainState.create(_params(key=7), tx, ema_decay=0.99),
                              mesh2)
    restored = ckpt_lib.load_checkpoint(path, fresh)

    # placement: every restored leaf landed on the target's sharding
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(fresh)):
        if hasattr(got, "sharding"):
            assert got.sharding.is_equivalent_to(want.sharding, got.ndim), (
                got.sharding, want.sharding)

    assert _tree_equal(restored.params, state.params) == 0.0
    step_fn2 = make_train_step(_loss_fn, tx, mesh=mesh2)
    resumed, _ = step_fn2(restored, shard_batch(_batch(1), mesh2),
                          jax.random.PRNGKey(1))
    assert _tree_equal(resumed.params, cont.params) == 0.0
    assert _tree_equal(resumed.ema.shadow, cont.ema.shadow) == 0.0


def test_roundtrip_across_shardings(tmp_path):
    """A checkpoint written UNSHARDED restores onto an fsdp mesh (and the
    values survive the resharding) — the cold-start-on-more-chips path."""
    if len(CPUS) < 8:
        pytest.skip("needs 8 CPU devices")
    tx = optim_lib.adafactor(lr=1e-3)
    state = TrainState.create(_params(), tx, ema_decay=None)
    step_fn = make_train_step(_loss_fn, tx)
    state, _ = step_fn(state, _batch(0), jax.random.PRNGKey(0))
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), int(state.step), state)

    mesh = make_mesh(CPUS[:8], fsdp=8)
    fresh = shard_train_state(TrainState.create(_params(key=3), tx, ema_decay=None),
                              mesh)
    restored = ckpt_lib.load_checkpoint(path, fresh)
    assert _tree_equal(restored.params, state.params) == 0.0
    w = restored.params["w"]
    assert w.sharding.is_equivalent_to(fresh.params["w"].sharding, w.ndim)
