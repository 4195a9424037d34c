"""Jitted, mesh-sharded train step with fused EMA.

The reference's ``run_step`` (reference: scripts/train_ddpm.py:171-192):
micro-batch loop + DDP all-reduce + clip + optimizer step + EMA update —
becomes ONE compiled function: gradients of the data-sharded global batch are
averaged by XLA's psum over the mesh, micro-batching is a ``lax.scan``, and
the EMA update is a fused tree-map on device.  No host synchronisation inside
a step.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmtpu.models.ema import EMAState
from dmtpu.parallel.mesh import batch_sharding, param_sharding

Array = jax.Array
LossFn = Callable[[Any, Any, Array], Array]  # (params, batch, rng) -> scalar loss


@struct.dataclass
class TrainState:
    step: Array  # int32 scalar
    params: Any
    opt_state: Any
    ema: Optional[EMAState]

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        ema_decay: Optional[float] = 0.9999,
        ema_gradual: bool = True,
        ema_dtype: Any = None,
    ) -> "TrainState":
        """``ema_dtype="bfloat16"`` halves the EMA shadow's HBM (see
        ``EMAState.create`` for the resolution caveat)."""
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema=(EMAState.create(params, ema_decay, ema_gradual, dtype=ema_dtype)
                 if ema_decay is not None else None),
        )


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    clip_grad_norm: Optional[float] = None,
    micro_batches: int = 1,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
    n_extra_args: int = 0,
) -> Callable[[TrainState, Any, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Build the compiled ``(state, batch, rng, *extra) -> (state, metrics)``
    step.

    ``micro_batches > 1`` reproduces the reference's gradient accumulation
    (reference: scripts/train_ddpm.py:176-185) as a scan over leading-axis
    splits of the batch.

    ``n_extra_args`` positional pytrees after ``rng`` are forwarded to
    ``loss_fn(params, batch, rng, *extra)`` unchanged and replicated on the
    mesh — the seam for FROZEN towers (latent-diffusion fine-tuning passes
    the VAE + text-encoder params here: they must be jit ARGUMENTS, not
    closures, so the weight tree is never baked into the lowering, and they
    must not be batch-sharded like the data).

    ``donate=True`` donates the input state's buffers (halves peak HBM for
    the optimizer update); off by default because some PJRT transports (the
    axon tunnel used in CI) reject donation with InvalidArgument.
    """

    def grads_of(params, batch, rng, *extra):
        return jax.value_and_grad(loss_fn)(params, batch, rng, *extra)

    def step_fn(state: TrainState, batch: Any, rng: Array, *extra):
        if micro_batches > 1:
            mb = jax.tree.map(
                lambda x: x.reshape((micro_batches, x.shape[0] // micro_batches) + x.shape[1:]),
                batch,
            )
            keys = jax.random.split(rng, micro_batches)

            def accum(carry, inp):
                loss_sum, grad_sum = carry
                b, k = inp
                loss, grads = grads_of(state.params, b, k, *extra)
                return (loss_sum + loss, jax.tree.map(jnp.add, grad_sum, grads)), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(accum, (jnp.zeros(()), zero), (mb, keys))
            loss = loss / micro_batches
            grads = jax.tree.map(lambda g: g / micro_batches, grads)
        else:
            loss, grads = grads_of(state.params, batch, rng, *extra)

        grad_norm = optax.global_norm(grads)
        if clip_grad_norm is not None:
            scale = jnp.minimum(1.0, clip_grad_norm / (grad_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema.update(new_params) if state.ema is not None else None
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema=new_ema,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    bsh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(None, bsh, rep) + (rep,) * n_extra_args,
        donate_argnums=(0,) if donate else (),
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host-side state on the mesh (params/opt/ema per the fsdp rule)."""
    psh = param_sharding(mesh, state.params)
    rep = NamedSharding(mesh, P())

    def place_like(tree, shardings):
        return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)

    new_params = place_like(state.params, psh)

    # optimizer moments dominate HBM; shard any leaf whose shape matches a
    # parameter's by the same fsdp rule, replicate the rest (counters etc.)
    def opt_leaf(x):
        sh = param_sharding(mesh, {"x": x})["x"] if hasattr(x, "ndim") else rep
        return jax.device_put(x, sh)

    new_opt = jax.tree.map(opt_leaf, state.opt_state)
    ema = state.ema
    if ema is not None:
        ema = ema.replace(
            shadow=place_like(ema.shadow, param_sharding(mesh, ema.shadow)),
            num_updates=jax.device_put(ema.num_updates, rep),
        )
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=new_params,
        opt_state=new_opt,
        ema=ema,
    )


def make_diffusion_loss_fn(
    diffuser,
    apply_fn: Callable[..., Array],
    total_steps: int,
    p_uncond: Optional[float] = None,
    null_label: Optional[int] = None,
    cond_key: str = "y",
) -> LossFn:
    """Standard diffusion loss: sample t, (optionally) drop labels, MSE.

    ``p_uncond``/``null_label`` implement classifier-free-guidance label
    dropout (reference: scripts/train_ddpm_cfg.py:180-181; the reference
    drops per micro-batch, we drop per sample — strictly finer-grained).
    """

    def loss_fn(params, batch, rng):
        if isinstance(batch, dict):
            x0 = batch["image"]
            model_kwargs = {k: v for k, v in batch.items() if k != "image"}
        elif isinstance(batch, (tuple, list)):
            x0, y = batch
            model_kwargs = {cond_key: y}
        else:
            x0 = batch
            model_kwargs = {}
        k_t, k_eps, k_drop, k_dropout = jax.random.split(rng, 4)
        b = x0.shape[0]
        t = jax.random.randint(k_t, (b,), 0, total_steps)
        if p_uncond is not None and cond_key in model_kwargs:
            drop = jax.random.bernoulli(k_drop, p_uncond, (b,))
            y = model_kwargs[cond_key]
            model_kwargs[cond_key] = jnp.where(drop, jnp.full_like(y, null_label), y)

        def model_fn(xt, tt, **kw):
            return apply_fn(params, xt, tt, rngs={"dropout": k_dropout}, **kw)

        return diffuser.loss_func(model_fn, x0, t, rng=k_eps, model_kwargs=model_kwargs)

    return loss_fn
