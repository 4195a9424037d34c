"""Explicit guidance: pluggable per-step hooks inside the compiled loop.

The reference hooks guidance at 4 points — predicted eps / x0 / posterior
mean / sampled x_{t-1} — and re-propagates each hook's delta to the other
quantities (reference: diffusions/guidance/base.py:46-142).  Same seam here,
but each hook is a pure function of (step outputs, xt, tape row, rng) whose
``None`` return statically removes the branch from the traced graph.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dmtpu.diffusions.ddpm import DDPM, Array


class BaseGuidance(DDPM):
    """DDPM whose scan step applies the 4-point guidance transform."""

    # --- conversion helpers on one tape row ---------------------------------
    @staticmethod
    def pred_mu_from_x0(xt: Array, c: Dict[str, Array], x0: Array) -> Array:
        """(reference: diffusions/guidance/base.py:28-36)"""
        return c["mean_coef1"] * x0 + c["mean_coef2"] * xt

    @staticmethod
    def pred_x0_from_mu(xt: Array, c: Dict[str, Array], mu: Array) -> Array:
        """(reference: diffusions/guidance/base.py:38-44)"""
        return (mu - c["mean_coef2"] * xt) / c["mean_coef1"]

    @staticmethod
    def _pred_x0_from_eps_c(xt: Array, c: Dict[str, Array], eps: Array) -> Array:
        return c["sqrt_recip_ac"] * xt - c["sqrt_recipm1_ac"] * eps

    @staticmethod
    def _pred_eps_from_x0_c(xt: Array, c: Dict[str, Array], x0: Array) -> Array:
        return (c["sqrt_recip_ac"] * xt - x0) / c["sqrt_recipm1_ac"]

    # --- hook points (return a delta array, or None to skip) ----------------
    def cond_fn_eps(self, out: Dict[str, Array], xt: Array, c, rng) -> Optional[Array]:
        return None

    def cond_fn_x0(self, out: Dict[str, Array], xt: Array, c, rng) -> Optional[Array]:
        return None

    def cond_fn_mean(self, out: Dict[str, Array], xt: Array, c, rng) -> Optional[Array]:
        return None

    def cond_fn_sample(self, out: Dict[str, Array], xt: Array, c, rng) -> Optional[Array]:
        return None

    # ------------------------------------------------------------------
    def apply_guidance(self, out: Dict[str, Array], xt: Array, c, rng) -> Dict[str, Array]:
        """(reference: diffusions/guidance/base.py:74-142)"""
        new = dict(out)
        var, reverse_eps, nz = out["var"], out["reverse_eps"], c["nonzero"]
        std = jnp.sqrt(var)
        keys = jax.random.split(rng, 4)

        g = self.cond_fn_eps(out, xt, c, keys[0])
        if g is not None:
            new["pred_eps"] = out["pred_eps"] + g
            new["pred_x0"] = self._pred_x0_from_eps_c(xt, c, new["pred_eps"])
            new["mean"] = self.pred_mu_from_x0(xt, c, new["pred_x0"])
            new["sample"] = new["mean"] + nz * std * reverse_eps

        g = self.cond_fn_x0(out, xt, c, keys[1])
        if g is not None:
            new["pred_x0"] = out["pred_x0"] + g
            new["pred_eps"] = self._pred_eps_from_x0_c(xt, c, new["pred_x0"])
            new["mean"] = self.pred_mu_from_x0(xt, c, new["pred_x0"])
            new["sample"] = new["mean"] + nz * std * reverse_eps

        g = self.cond_fn_mean(out, xt, c, keys[2])
        if g is not None:
            new["mean"] = out["mean"] + g
            new["pred_x0"] = self.pred_x0_from_mu(xt, c, new["mean"])
            new["pred_eps"] = self._pred_eps_from_x0_c(xt, c, new["pred_x0"])
            new["sample"] = new["mean"] + nz * std * reverse_eps

        g = self.cond_fn_sample(out, xt, c, keys[3])
        if g is not None:
            # note: reference adds to the ORIGINAL sample, not the re-propagated one
            new["sample"] = out["sample"] + g

        return new
