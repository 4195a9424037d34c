"""Gradient-checkpointing policies (selective rematerialisation).

Plain ``jax.checkpoint`` recomputes EVERYTHING in the backward pass; on TPU
the expensive recompute is the MXU matmuls, while the elementwise prologue
(GN/SiLU/modulation) is cheap to redo and large to store.  XLA's
``checkpoint_policies`` split the difference: ``dots`` saves matmul outputs
and recomputes only the cheap elementwise chains — near-no-remat speed at a
fraction of no-remat's activation memory (measured numbers in
docs/ROADMAP.md "Selective remat").

Config surface: model ``use_checkpoint`` options accept ``True`` (full
remat), ``False``, or a policy name string (e.g. ``"dots"``) resolved here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax

POLICIES = {
    # save every matmul/conv output; recompute elementwise-only chains
    "dots": "dots_saveable",
    "dots_saveable": "dots_saveable",
    # save matmuls whose operands have no batch dims (weights-stationary
    # dots) — the transformer-torso middle ground
    "dots_no_batch": "dots_with_no_batch_dims_saveable",
    "nothing": "nothing_saveable",   # == full remat
    "everything": "everything_saveable",  # == no remat (debug)
}

# named-tensor policies: save ONLY checkpoint_name-tagged outputs.  "attn"
# keeps each attention module's output (S x inner — ~300 MB at SD1.5 b16,
# vs "dots"'s every-matmul OOM) so the backward never re-runs the flash
# forward kernel, the single costliest recompute under full remat.
NAMED_POLICIES = {
    "attn": ("attn_out",),
}


def checkpoint_policy(name: Optional[str]) -> Optional[Callable[..., Any]]:
    """Resolve a policy name to a ``jax.checkpoint_policies`` callable
    (None -> None: full remat, the default)."""
    if name is None:
        return None
    if name in NAMED_POLICIES:
        return jax.checkpoint_policies.save_only_these_names(
            *NAMED_POLICIES[name])
    try:
        return getattr(jax.checkpoint_policies, POLICIES[name])
    except KeyError:
        raise ValueError(
            f"unknown checkpoint policy {name!r}; options: "
            f"{sorted(POLICIES) + sorted(NAMED_POLICIES)}")


def normalize_use_checkpoint(use_checkpoint):
    """Split a config's ``use_checkpoint`` into (enabled, policy):
    True/False keep full/no remat; a string enables remat under that
    named policy."""
    if isinstance(use_checkpoint, str):
        return True, checkpoint_policy(use_checkpoint)
    return bool(use_checkpoint), None
