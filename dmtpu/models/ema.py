"""Exponential moving average of parameters, as a pure pytree transform.

The reference keeps a mutable shadow list with in-place updates
(reference: models/ema.py:7-79).  On TPU the EMA is just another leaf of the
jitted train state: ``update`` is a fused tree-map executed on device inside
the train step, so it costs one HBM pass and no host sync.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Params = Any


@struct.dataclass
class EMAState:
    shadow: Params
    num_updates: jax.Array  # int32 scalar
    decay: float = struct.field(pytree_node=False, default=0.9999)
    gradual: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, params: Params, decay: float = 0.9999, gradual: bool = True,
               dtype: Any = None) -> "EMAState":
        """``dtype`` (e.g. ``jnp.bfloat16`` or ``"bfloat16"``) stores the
        shadow in that dtype — halves EMA HBM for f32 params (the +3.4 GB
        that pushes single-chip SD1.5 EMA fine-tuning past 16 GB,
        docs/ROADMAP.md).  Caveat: near convergence, per-step EMA increments
        of relative size (1-decay)·|p-s|/|s| below bf16's ~2^-8 resolution
        round away, so a bf16 shadow tracks long slow-decay averages more
        coarsely than f32 — appropriate for fine-tunes, not the default."""
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        cast = ((lambda p: jnp.asarray(p, dtype)
                 if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else jnp.asarray(p))
                if dtype is not None else jnp.asarray)
        return cls(
            shadow=jax.tree.map(cast, params),
            num_updates=jnp.zeros((), jnp.int32),
            decay=decay,
            gradual=gradual,
        )

    def get_decay(self) -> jax.Array:
        """min(decay, (1+n)/(10+n)) warm-up.  (reference: models/ema.py:38-42)"""
        if not self.gradual:
            return jnp.asarray(self.decay, jnp.float32)
        n = self.num_updates.astype(jnp.float32)
        return jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))

    def update(self, params: Params) -> "EMAState":
        """shadow -= (1-decay) * (shadow - param).  (reference: models/ema.py:44-52)"""
        new_n = self.num_updates + 1
        d = self.replace(num_updates=new_n).get_decay() if self.gradual else jnp.asarray(self.decay)
        # match reference ordering: num_updates incremented BEFORE decay is read
        new_shadow = jax.tree.map(
            lambda s, p: (s - (1.0 - d) * (s - p)).astype(s.dtype), self.shadow, params
        )
        return self.replace(shadow=new_shadow, num_updates=new_n)
