"""Data-parallel train-step semantics on a simulated 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dmtpu.diffusions import DDPM
from dmtpu.models import UNet
from dmtpu.parallel import (
    TrainState,
    make_diffusion_loss_fn,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
)


def cpu_mesh(fsdp=1):
    devs = jax.devices("cpu")
    assert len(devs) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(devs, fsdp=fsdp)


@pytest.fixture(scope="module")
def tiny_setup():
    model = UNet(dim=32, dim_mults=(1, 2), use_attn=(False, True), num_res_blocks=1)
    diffuser = DDPM(total_steps=100)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )
    tx = optax.adam(1e-3)
    loss_fn = make_diffusion_loss_fn(diffuser, model.apply, total_steps=100)
    return model, diffuser, params, tx, loss_fn


def test_train_step_runs_and_descends(tiny_setup):
    _, _, params, tx, loss_fn = tiny_setup
    state = TrainState.create(params, tx, ema_decay=0.999)
    step = make_train_step(loss_fn, tx, clip_grad_norm=1.0, donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    assert int(state.ema.num_updates) == 5


def test_data_parallel_matches_single_device(tiny_setup):
    """Same batch, same rng: 8-way sharded step == single-device step.

    Uses SGD (linear in gradients) so the comparison is not dominated by
    Adam's first-step g/|g| sign sensitivity to float association order.
    """
    _, _, params, _, loss_fn = tiny_setup
    tx = optax.sgd(0.1)
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 8, 3))
    rng = jax.random.PRNGKey(3)

    state1 = TrainState.create(params, tx, ema_decay=0.999)
    step1 = make_train_step(loss_fn, tx, donate=False)
    state1, m1 = step1(state1, batch, rng)

    mesh = cpu_mesh()
    state8 = shard_train_state(TrainState.create(params, tx, ema_decay=0.999), mesh)
    step8 = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    state8, m8 = step8(state8, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_micro_batch_accumulation_equivalence(tiny_setup):
    """micro_batches=4 gives the same update as a plain full-batch step,
    when the loss rng is shared (we fix t/eps by passing identical keys)."""
    _, _, params, _, _ = tiny_setup
    tx = optax.sgd(0.1)  # linear in grads -> exact accumulation equivalence

    # deterministic loss (no rng dependence) so accumulation comparison is exact
    def det_loss(p, b, rng):
        from dmtpu.models import UNet
        model = UNet(dim=32, dim_mults=(1, 2), use_attn=(False, True), num_res_blocks=1)
        out = model.apply(p, b, jnp.zeros((b.shape[0],), jnp.int32))
        return jnp.mean(out ** 2)

    batch = jax.random.normal(jax.random.PRNGKey(4), (8, 8, 8, 3))
    rng = jax.random.PRNGKey(5)

    s_full = TrainState.create(params, tx, ema_decay=None)
    s_acc = TrainState.create(params, tx, ema_decay=None)
    full = make_train_step(det_loss, tx, donate=False)
    acc = make_train_step(det_loss, tx, micro_batches=4, donate=False)
    s_full, mf = full(s_full, batch, rng)
    s_acc, ma = acc(s_acc, batch, rng)
    np.testing.assert_allclose(float(mf["loss"]), float(ma["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_acc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_fsdp_sharding_runs(tiny_setup):
    """Params sharded over a 2-way fsdp axis still train correctly."""
    _, _, params, tx, loss_fn = tiny_setup
    mesh = cpu_mesh(fsdp=2)
    state = shard_train_state(TrainState.create(params, tx, ema_decay=0.999), mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    batch = shard_batch(jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3)), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    # at least one large param leaf actually sharded
    shardings = [x.sharding for x in jax.tree.leaves(state.params)]
    assert any(
        s.spec != jax.sharding.PartitionSpec() for s in shardings
    )


def test_label_dropout_loss(tiny_setup):
    from dmtpu.models import UNetCategorialAdaGN

    model = UNetCategorialAdaGN(dim=32, dim_mults=(1, 2), use_attn=(False, False), num_classes=10)
    diffuser = DDPM(total_steps=100)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    loss_fn = make_diffusion_loss_fn(
        diffuser, model.apply, total_steps=100, p_uncond=0.5, null_label=10
    )
    batch = (
        jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3)),
        jnp.arange(8) % 10,
    )
    loss = loss_fn(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_dp_sampling_matches_single_device(tiny_setup):
    """Data-parallel (8-way) DDIM sampling == single-device sampling."""
    from dmtpu.diffusions import DDIM
    from dmtpu.parallel.mesh import batch_sharding, replicated_sharding

    model, _, params, _, _ = tiny_setup[0], None, tiny_setup[2], None, None
    diffuser = DDIM(total_steps=100, respace_type="uniform", respace_steps=5)

    def sample(p, noise):
        return diffuser.sample(
            lambda x, t, **kw: model.apply(p, x, t), noise, jax.random.PRNGKey(0))

    noise = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 3))
    single = jax.jit(sample)(params, noise)

    mesh = cpu_mesh()
    bsh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    p8 = jax.tree.map(lambda a: jax.device_put(a, rep), params)
    n8 = jax.device_put(noise, bsh)
    multi = jax.jit(sample)(p8, n8)
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi), rtol=2e-5, atol=2e-5)


def test_fsdp_matches_pure_dp_numerics(tiny_setup):
    """Same batch + rng: (data=4, fsdp=2) step == pure-DP (data=8) step.

    ZeRO-style param/opt-state sharding must not change the math — only the
    layout.  SGD keeps the comparison free of Adam's first-step sign
    sensitivity (same rationale as the DP-vs-single test above).
    """
    _, _, params, _, loss_fn = tiny_setup
    tx = optax.sgd(0.1)
    batch = jax.random.normal(jax.random.PRNGKey(8), (16, 8, 8, 3))
    rng = jax.random.PRNGKey(9)

    def run(mesh):
        state = shard_train_state(TrainState.create(params, tx, ema_decay=0.999), mesh)
        step = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
        state, m = step(state, shard_batch(batch, mesh), rng)
        return state, float(m["loss"])

    s_dp, loss_dp = run(cpu_mesh(fsdp=1))
    s_fsdp, loss_fsdp = run(cpu_mesh(fsdp=2))

    np.testing.assert_allclose(loss_dp, loss_fsdp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(s_dp.ema.shadow), jax.tree.leaves(s_fsdp.ema.shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_tensor_parallel_sd_unet_matches_replicated():
    """Megatron-style TP sharding of the SD transformer weights (column/row
    split over the model axis) must not change numerics — GSPMD inserts the
    collectives.  Beyond-parity feature for SDXL @ 1024² (SURVEY.md §2d)."""
    from dmtpu.models.stablediffusion.unet import SDUNetModel
    from dmtpu.parallel import shard_params_tp, tp_param_sharding
    from jax.sharding import PartitionSpec as P

    model = SDUNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=16, legacy=False)
    x = jnp.ones((8, 8, 8, 4))
    t = jnp.arange(8)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    want = np.asarray(model.apply(params, x, t, ctx))

    mesh = cpu_mesh(fsdp=2)  # (data=4, fsdp=2): fsdp doubles as the TP axis
    shardings = tp_param_sharding(mesh, params)
    specs = {s.spec for s in jax.tree.leaves(shardings)}
    assert P(None, "fsdp") in specs, "column-parallel qkv/ff kernels"
    assert P("fsdp", None) in specs, "row-parallel out/proj kernels"

    p_tp = shard_params_tp(params, mesh)
    from dmtpu.parallel.mesh import batch_sharding
    x_sh = jax.device_put(x, batch_sharding(mesh))
    got = np.asarray(jax.jit(model.apply)(p_tp, x_sh, t, ctx))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_rules_do_not_shard_embedding_projections():
    """Regression: bare 'proj' leaves (AdaGN / ResBlock time-embed
    projections fed by REPLICATED embeddings) must stay replicated; only
    attention/ff pairs get the Megatron column/row split."""
    from dmtpu.parallel.tp import _classify

    assert _classify(("blocks_0", "attn", "proj", "kernel")) == "row"
    assert _classify(("down_0", "res_0", "proj", "kernel")) == "replicate"
    assert _classify(("ada", "proj", "kernel")) == "replicate"
    assert _classify(("t1", "to_q", "kernel")) == "column"
    assert _classify(("t1", "to_out__0", "kernel")) == "row"
    assert _classify(("blocks_0", "attn", "qkv", "kernel")) == "column"
