"""Device mesh and sharding helpers.

Replaces the reference's Accelerate/NCCL DDP (reference: scripts/train_ddpm.py:54,166)
with a ``jax.sharding.Mesh``: the batch is sharded over the ``data`` axis and
parameters are either replicated or sharded over an optional ``fsdp`` axis
(ZeRO-style), with XLA inserting the all-reduce/all-gather collectives over
ICI.  Multi-host (DCN) uses the same mesh via ``jax.distributed.initialize``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    fsdp: int = 1,
) -> Mesh:
    """Build a (data, fsdp) mesh over the given devices.

    With ``devices=None``: all devices of the pinned default backend if
    ``jax.config.jax_default_device`` is set (the test suite pins CPU this
    way — a TPU-backend mesh inside the CPU-pinned suite would be wrong),
    otherwise all devices of the default backend.
    """
    if devices is None:
        dd = jax.config.jax_default_device
        platform = getattr(dd, "platform", dd) if dd is not None else None
        devices = jax.devices(platform) if platform is not None else jax.devices()
    devices = list(devices)
    n = len(devices)
    if n % fsdp != 0:
        raise ValueError(f"fsdp={fsdp} must divide device count {n}")
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim split over data (and fsdp, which also sees data)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Per-leaf sharding: replicated, or largest-dim split over fsdp if >1.

    Simple ZeRO-3-style rule: shard each parameter's largest axis over the
    fsdp mesh axis when it divides evenly; otherwise replicate the leaf.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]

    def leaf_sharding(x):
        if fsdp_size == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        axis = int(np.argmax(dims))
        if dims[axis] % fsdp_size == 0:
            spec = [None] * x.ndim
            spec[axis] = FSDP_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, params)


def shard_batch(batch, mesh: Mesh):
    """Assemble a per-host batch into the mesh's data sharding.

    Single-host: a plain sharded device_put.  Multi-host: each process holds
    only its local slice, so the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — device_put of a local batch
    against a global sharding would silently shrink the global batch to the
    per-host size.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    import numpy as _np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, _np.asarray(x)), batch
    )
