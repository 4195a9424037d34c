"""Orbax checkpointing with the reference's directory layout.

The reference writes ``runs/<exp>/ckpt/step{N}/`` with model / ema /
optimizer / meta files (reference: scripts/train_ddpm.py:141-156) and resumes
via best/latest/path (reference: utils/misc.py:53-68 — see
``dmtpu.utils.misc.find_resume_checkpoint``).  Here each step directory is a
single orbax PyTree checkpoint of the whole ``TrainState``.

Sharded-native: ``save_checkpoint`` hands the (possibly fsdp-sharded)
state straight to orbax, which writes each process's shards without ever
gathering the tree to one host — a ``jax.device_get`` gather would both
peak host RAM at full model+optimizer size and fail outright for
cross-process-sharded arrays.  ``load_checkpoint`` restores every leaf
directly onto the ``target`` leaf's sharding (resharding from whatever
layout the checkpoint was written under), so a run can resume on a
different mesh than it was saved from.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Write ``<ckpt_dir>/step{step:0>6}`` as one orbax pytree (no host gather)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step{step:0>6d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree checkpoint.

    ``target`` provides structure, dtypes AND placement: each restored leaf
    lands on the corresponding target leaf's sharding (mesh-sharded targets
    restore sharded; a fresh host-side target restores addressably).
    """
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(os.path.abspath(path))
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        return ckptr.restore(os.path.abspath(path), item=target,
                             restore_args=restore_args)


def load_checkpoint_host(path: str) -> Any:
    """Restore a checkpoint to HOST numpy arrays, ignoring the shardings it
    was saved under — for offline tools (e.g. ``scripts/merge_lora.py``)
    that must read a checkpoint written on a different device topology."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(path, restore_args=restore_args)


def save_array_dict(path: str, arrays: dict) -> None:
    """Flat .npz export (portable model-only weights)."""
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
