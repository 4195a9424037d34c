"""Tensor-parallel (Megatron-style) sharding rules for the SD/SDXL
cross-attention transformers.

Beyond-parity (the reference is DP-only, SURVEY.md §2d): at SDXL 1024² the
2.6B-param UNet benefits from sharding the transformer weights over a model
axis.  With GSPMD there are no hand-written collectives — the rules below
place each weight, and XLA inserts the all-gather/reduce-scatter pattern of
column→row parallelism over ICI:

  - ``to_q/to_k/to_v`` and GEGLU/ff first layers: COLUMN parallel
    (output features split — each shard computes its own heads / hidden
    slice with no communication),
  - ``to_out`` / ff second layer / ``proj_out``: ROW parallel (input
    features split — XLA finishes with one psum per block).

Everything not matched (convs, norms, embeddings) is replicated over the
model axis; the ``data`` axis still shards the batch.  The rules key on the
flax param paths of ``dmtpu.models.stablediffusion.attention`` (names mirror
the torch layout).
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmtpu.parallel.mesh import FSDP_AXIS

# flax path-suffix -> which kernel axis is split over the model axis.
# Row-parallel layers must sit downstream of a column-parallel producer
# (Megatron pairing); a bare "proj" leaf is NOT enough — AdaGN / ResBlock
# time-embed projections are also named "proj" but consume REPLICATED
# embeddings, and row-sharding them only buys a useless psum per block.
# "attn__proj" scopes the rule to the DiT/MDT attention out-projection,
# whose qkv producer is column-sharded.
_COLUMN = ("to_q", "to_k", "to_v", "net__0__proj", "net__0__0", "qkv")
_ROW = ("to_out__0", "net__2", "proj_out", "attn__proj")


def _classify(path: Tuple[str, ...]) -> str:
    if path[-1] != "kernel":
        return "replicate"
    mods = path[:-1]
    name = "__".join(mods[-2:]) if len(mods) >= 2 else mods[-1]
    leaf = mods[-1]
    if leaf in _COLUMN or name in _COLUMN:
        return "column"
    if leaf in _ROW or name in _ROW:
        return "row"
    return "replicate"


def tp_param_sharding(mesh: Mesh, params, axis: str = FSDP_AXIS):
    """Per-leaf NamedSharding tree implementing the rules above.

    ``axis``: mesh axis used as the model/tensor axis (default: reuse the
    ``fsdp`` axis of the standard (data, fsdp) mesh).
    """
    size = mesh.shape[axis]

    def one(path, x):
        names = tuple(str(p.key) for p in path)
        kind = _classify(names)
        if size == 1 or x.ndim < 2 or kind == "replicate":
            return NamedSharding(mesh, P())
        if kind == "column" and x.shape[-1] % size == 0:
            spec = [None] * x.ndim
            spec[-1] = axis
            return NamedSharding(mesh, P(*spec))
        if kind == "row" and x.shape[-2] % size == 0:
            spec = [None] * x.ndim
            spec[-2] = axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params, mesh: Mesh, axis: str = FSDP_AXIS):
    """device_put the params with tensor-parallel placements."""
    shardings = tp_param_sharding(mesh, params, axis=axis)
    return jax.tree.map(jax.device_put, params, shardings)
