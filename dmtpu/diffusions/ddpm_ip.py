"""DDPM with Input Perturbation (training-time only).

Perturb the diffusion noise during training — ``xt = diffuse(x0, t, eps +
gamma*eps')`` — while still regressing the ORIGINAL eps/x0/v target
(reference: diffusions/ddpm_ip.py:11-48).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dmtpu.diffusions.ddpm import DDPM, Array, ModelFn


class DDPM_IP(DDPM):
    def __init__(self, gamma: float = 0.1, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.gamma = float(gamma)

    def loss_func(
        self,
        model_fn: ModelFn,
        x0: Array,
        t: Array,
        eps: Optional[Array] = None,
        rng: Optional[Array] = None,
        perturb_eps: Optional[Array] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Array:
        model_kwargs = model_kwargs or {}
        if eps is None or perturb_eps is None:
            k1, k2 = jax.random.split(rng)
            if eps is None:
                eps = jax.random.normal(k1, x0.shape, x0.dtype)
            if perturb_eps is None:
                perturb_eps = jax.random.normal(k2, x0.shape, x0.dtype)
        perturbed = eps + self.gamma * perturb_eps
        xt = self.diffuse(x0, t, perturbed)
        pred = model_fn(xt, t, **model_kwargs)
        if self.objective == "pred_eps":
            target = eps
        elif self.objective == "pred_x0":
            target = x0
        else:  # pred_v
            target = self.get_v(x0, eps, t)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
