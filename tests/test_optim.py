"""Memory-efficient optimizer factories.

Round-3 training-memory work (docs/ROADMAP.md "memory wall"): f32 Adam
moments for SD1.5's 859M params are 6.9 GB of a 16 GB v5e — ``adafactor``
(factored second moment) and ``adam(mu_dtype='bfloat16')`` are the
single-chip routes through it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.parallel import TrainState, make_train_step
from dmtpu.utils import optim as optim_lib
from dmtpu.utils.config import instantiate_from_config


def _toy_params(key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {"w": jax.random.normal(k1, (64, 32)) * 0.1,
            "b": jnp.zeros((32,)),
            "emb": jax.random.normal(k2, (128, 16)) * 0.1}


def test_adafactor_state_is_factored():
    params = _toy_params()
    tx = optim_lib.adafactor(lr=1e-3, min_dim_size_to_factor=8)
    state = tx.init(params)
    sizes = [int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(state)
             if hasattr(leaf, "shape")]
    n_param = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # the factored second moment stores row+col vectors, never a full matrix
    assert max(sizes) < 64 * 32
    assert sum(sizes) < n_param


def test_adafactor_reduces_toy_loss():
    params = _toy_params()
    target = jax.random.normal(jax.random.PRNGKey(9), (8, 32))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 64))

    def loss(p):
        return jnp.mean((x @ p["w"] + p["b"] - target) ** 2)

    tx = optim_lib.adafactor(lr=1e-2)
    state = tx.init(params)
    l0 = float(loss(params))
    for _ in range(20):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(loss(params)) < l0 * 0.5


def test_adam_bf16_first_moment():
    params = _toy_params()
    tx = optim_lib.adam(lr=1e-3, mu_dtype="bfloat16")
    state = tx.init(params)
    dtypes = {leaf.dtype for leaf in jax.tree.leaves(state) if hasattr(leaf, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in dtypes  # mu stored in bf16
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    # params stay f32 and finite; mu stays bf16 after the update too
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(new_params))
    assert all(np.isfinite(np.asarray(leaf, np.float32)).all()
               for leaf in jax.tree.leaves(new_params))
    assert jnp.dtype(jnp.bfloat16) in {leaf.dtype for leaf in jax.tree.leaves(state)
                            if hasattr(leaf, "dtype")}


def test_adafactor_from_config_and_lr_fn():
    conf = {"target": "dmtpu.utils.optim.adafactor", "params": {"lr": 3e-4}}
    tx = instantiate_from_config(conf)
    params = _toy_params()
    tx.init(params)  # builds
    assert abs(optim_lib.lr_fn(conf)(0) - 3e-4) < 1e-12
    # lr-less adafactor has no fixed step size -> logged LR must be NaN,
    # not a plausible-looking 1e-3
    assert np.isnan(optim_lib.lr_fn({"target": "dmtpu.utils.optim.adafactor"})(0))


def test_train_step_with_adafactor_and_ema():
    """The compiled train step (clip + update + EMA) composes with the
    factored optimizer state."""
    params = _toy_params()
    tx = optim_lib.adafactor(lr=1e-3)
    state = TrainState.create(params, tx, ema_decay=0.999)

    def loss_fn(p, batch, rng):
        return jnp.mean((batch @ p["w"] + p["b"]) ** 2)

    step = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    batch = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0.0
