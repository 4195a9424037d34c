"""Orbax checkpointing with the reference's directory layout.

The reference writes ``runs/<exp>/ckpt/step{N}/`` with model / ema /
optimizer / meta files (reference: scripts/train_ddpm.py:141-156) and resumes
via best/latest/path (reference: utils/misc.py:53-68 — see
``dmtpu.utils.misc.find_resume_checkpoint``).  Here each step directory is a
single orbax PyTree checkpoint of the whole ``TrainState``.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Write ``<ckpt_dir>/step{step:0>6}`` as one orbax pytree."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step{step:0>6d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree checkpoint; ``target`` provides structure/dtypes."""
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(os.path.abspath(path))
        shapes = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape") else x,
            jax.device_get(target),
        )
        restored = ckptr.restore(os.path.abspath(path), item=shapes)
        return restored


def save_array_dict(path: str, arrays: dict) -> None:
    """Flat .npz export (portable model-only weights)."""
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
