"""Pipeline parallelism (GPipe-style) over a mesh axis, via shard_map.

Beyond-parity (the reference is DP-only — SURVEY.md §2d).  Completes the
parallelism family next to fsdp (`mesh.py`), tensor (`tp.py`) and sequence
(`sp.py`) parallelism: the depth dimension of a homogeneous block stack is
sharded over a ``stage`` mesh axis, and microbatches stream through the
stages with one neighbour ``lax.ppermute`` hop per tick — the classic GPipe
schedule, M + S - 1 ticks for M microbatches over S stages, bubble fraction
(S-1)/(M+S-1).

TPU-native shape: per-stage block params live as ONE stacked pytree with a
leading layer axis sharded over the stage axis (an fsdp-like layout XLA
understands natively), the per-stage body is a ``lax.scan`` over the local
layer slices (single compiled block body), and the schedule itself is a
``lax.scan`` whose carry is the in-flight activation — no Python pipelining,
no per-stage programs: one SPMD program, ICI-neighbour communication only.
Because everything is functional, ``jax.grad`` through ``pipeline_apply``
yields the reverse schedule automatically (backward ppermutes ride the
transposed ring).

DiT is the natural client (28 identical adaLN blocks — `dmtpu/models/dit.py`
exposes embed/blocks/head seams); see ``dit_pipeline_forward``.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmtpu.parallel.mesh import FSDP_AXIS

Array = jax.Array


def stack_block_params(params: Any, prefix: str = "blocks__") -> Tuple[Any, Any, int]:
    """Split ``params`` into (stacked block tree, rest) by name prefix.

    ``params["params"]["{prefix}{i}"]`` for consecutive i are stacked
    leaf-wise along a NEW leading layer axis (the axis pipeline stages shard).
    Returns ``(stacked, rest_params, n_blocks)`` where ``rest_params`` is the
    original tree minus the blocks (embedders/head), still apply-able for the
    non-pipelined seams.
    """
    inner = params["params"] if "params" in params else params
    idx = sorted(
        (int(k[len(prefix):]) for k in inner.keys() if k.startswith(prefix)))
    if not idx or idx != list(range(len(idx))):
        raise ValueError(f"no consecutive '{prefix}i' blocks in params: {idx}")
    blocks = [inner[f"{prefix}{i}"] for i in idx]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    rest = {k: v for k, v in inner.items() if not k.startswith(prefix)}
    if "params" in params:
        rest = {**{k: v for k, v in params.items() if k != "params"},
                "params": rest}
    return stacked, rest, len(idx)


def pipeline_apply(
    stacked: Any,
    x: Array,
    cond: Array,
    block_fn: Callable[[Any, Array, Array], Array],
    mesh: Mesh,
    axis: str = FSDP_AXIS,
    n_microbatches: Optional[int] = None,
    dp_axis: Optional[str] = None,
) -> Array:
    """Run ``x`` through the stacked block pipeline; returns same-shape out.

    ``stacked``: pytree with leading layer axis L (L % stages == 0) — it is
    re-placed sharded over ``axis`` here, so each stage holds only its own
    L/S layer slices.  ``x``: [B, ...] activations; ``cond``: [B, ...] extra
    per-sample conditioning handed to every block (replicated).
    ``block_fn(layer_params, h, cond) -> h`` applies ONE block.
    ``n_microbatches`` defaults to the stage count (B % M == 0 required).

    ``dp_axis`` composes data parallelism with the pipeline (dp × pp in the
    ONE shard_map): each microbatch is additionally sharded over that mesh
    axis, so every ``data`` row runs its own pipeline over the ``axis``
    rows — batch must then divide microbatches × dp size.
    """
    if dp_axis == axis:
        raise ValueError("dp_axis must differ from the pipeline stage axis")
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    m = n_microbatches or n_stages
    if batch % m != 0:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")
    layers = jax.tree.leaves(stacked)[0].shape[0]
    if layers % n_stages != 0:
        raise ValueError(f"{layers} layers not divisible by {n_stages} stages")

    mb = batch // m
    if dp_axis is not None and mb % mesh.shape[dp_axis] != 0:
        raise ValueError(
            f"microbatch {mb} not divisible by mesh axis '{dp_axis}'="
            f"{mesh.shape[dp_axis]}")
    xs = x.reshape((m, mb) + x.shape[1:])
    cs = cond.reshape((m, mb) + cond.shape[1:])

    stage_spec = jax.tree.map(lambda _: P(axis), stacked)
    stacked = jax.device_put(
        stacked, jax.tree.map(lambda s: NamedSharding(mesh, s), stage_spec))
    rep = P(None, dp_axis) if dp_axis is not None else P()

    def local(stk: Any, xs_: Array, cs_: Array) -> Array:
        s = lax.axis_index(axis)
        steps = m + n_stages - 1
        perm = [(j, j + 1) for j in range(n_stages - 1)]  # no wraparound

        def stage_body(h: Array, c_: Array) -> Array:
            def one(hh, layer_params):
                return block_fn(layer_params, hh, c_), None

            h, _ = lax.scan(one, h, stk)
            return h

        def tick(carry, i):
            state, outs = carry
            # stage 0 feeds microbatch i; later stages feed the activation
            # received last tick.  Bubble ticks compute garbage that never
            # reaches a valid output slot (it exits past the last tick).
            mb_in = lax.dynamic_index_in_dim(xs_, jnp.clip(i, 0, m - 1), 0,
                                             keepdims=False)
            c_in = lax.dynamic_index_in_dim(cs_, jnp.clip(i - s, 0, m - 1), 0,
                                            keepdims=False)
            h = jnp.where(s == 0, mb_in, state)
            h = stage_body(h, c_in)
            out_i = jnp.clip(i - (n_stages - 1), 0, m - 1)
            valid = (s == n_stages - 1) & (i >= n_stages - 1)
            outs = jnp.where(
                valid, lax.dynamic_update_index_in_dim(outs, h, out_i, 0), outs)
            state = lax.ppermute(h, axis, perm)
            return (state, outs), None

        state0 = jnp.zeros_like(xs_[0])
        outs0 = jnp.zeros_like(xs_)
        (_, outs), _ = lax.scan(tick, (state0, outs0), jnp.arange(steps))
        # results live on the last stage only; psum broadcasts (others hold 0)
        return lax.psum(jnp.where(s == n_stages - 1, outs, 0), axis)

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(stage_spec, rep, rep), out_specs=rep, check_vma=False,
    )(stacked, xs, cs)
    return out.reshape((batch,) + out.shape[2:])


def dit_pipeline_forward(model, params, x: Array, t: Array, y=None, *,
                         mesh: Mesh, axis: str = FSDP_AXIS,
                         n_microbatches: Optional[int] = None,
                         dp_axis: Optional[str] = None,
                         stacked: Any = None, rest: Any = None) -> Array:
    """DiT forward with its 28-block torso pipelined over ``axis``.

    Numerically identical to ``model.apply(params, x, t, y)`` — the
    embed/head seams run replicated, the block stack streams through the
    GPipe schedule above.  ``dp_axis`` additionally shards each microbatch
    over that mesh axis (dp × pp).

    When called repeatedly OUTSIDE one enclosing jit (e.g. a per-step
    sampling loop), pass ``stacked``/``rest`` from one up-front
    ``stack_block_params(params)`` call — otherwise every invocation
    re-stacks (copies) the whole torso and re-places it on the mesh.
    Inside a jit the per-call stack is traced once and fused, so the
    default is fine there.
    """
    from dmtpu.models.dit import DiT, DiTBlock

    if stacked is None:
        stacked, rest, _ = stack_block_params(params)
    tokens, c = model.apply(rest, x, t, y, method=DiT.embed)
    blk = DiTBlock(model.num_heads, model.mlp_ratio, dtype=model.dtype)

    def block_fn(layer_params, h, cc):
        return blk.apply({"params": layer_params}, h, cc)

    tokens = pipeline_apply(stacked, tokens, c, block_fn, mesh, axis=axis,
                            n_microbatches=n_microbatches, dp_axis=dp_axis)
    return model.apply(rest, tokens, c, method=DiT.head)
