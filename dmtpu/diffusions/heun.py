"""Karras-style 2nd-order Heun sampler.

The reference (reference: diffusions/heun.py:56-131) carries mutable
``_1st_order_*`` state between two calls per loop iteration.  Here each scan
step is self-contained: the body runs the Euler predictor AND the trapezoid
corrector (2 model evaluations) for one (t, t_prev) pair; the final pair
(t_prev = -1) is a single predictor step run after the scan, giving the
reference's 2N-1 total NFE.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddpm import Array, ModelFn
from dmtpu.diffusions.euler import EulerSampler


class HeunSampler(EulerSampler):
    """Heun sampler for the DDPM-like diffusion process."""

    def sampler_tape(self) -> Dict[str, np.ndarray]:
        tape = super().sampler_tape()
        seq = self.respaced_seq
        ac_prev = np.concatenate([[1.0], self.alphas_cumprod[seq][:-1]])
        # predict() coefficients evaluated at t_prev, for the corrector stage
        tape["t_prev"] = np.concatenate([[-1], seq[:-1]])[::-1].astype(np.int32)
        tape["prev_sqrt_ac"] = np.sqrt(ac_prev)[::-1].astype(np.float32)
        tape["prev_sqrt_1m_ac"] = np.sqrt(1.0 - ac_prev)[::-1].astype(np.float32)
        tape["prev_sqrt_recip_ac"] = np.sqrt(1.0 / ac_prev)[::-1].astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            tape["prev_sqrt_recipm1_ac"] = np.sqrt(np.maximum(1.0 / ac_prev - 1.0, 0.0))[::-1].astype(np.float32)
        return tape

    def _heun_step(
        self,
        model_fn: ModelFn,
        xt: Array,
        c: Dict[str, Array],
        model_kwargs: Dict[str, Any],
    ) -> Dict[str, Array]:
        """Predictor + corrector for one (t, t_prev) pair, t_prev >= 0."""
        # --- 1st order (Euler predictor), reference: diffusions/heun.py:56-76
        t_batch = jnp.full((xt.shape[0],), c["t"], dtype=jnp.int32)
        out1 = model_fn(xt, t_batch, **model_kwargs)
        p1 = self.predict(out1, xt, c)
        bar_xt = c["sqrt_1p_sigma2"] * xt
        d1 = (bar_xt - p1["pred_x0"]) / c["sigma"]
        bar_s1 = bar_xt + d1 * (c["sigma_prev"] - c["sigma"])
        x_mid = bar_s1 / c["sqrt_1p_sigma_prev2"]

        # --- 2nd order (trapezoid corrector), reference: diffusions/heun.py:78-102
        c_prev = {
            "sqrt_recip_ac": c["prev_sqrt_recip_ac"],
            "sqrt_recipm1_ac": c["prev_sqrt_recipm1_ac"],
            "sqrt_ac": c["prev_sqrt_ac"],
            "sqrt_1m_ac": c["prev_sqrt_1m_ac"],
        }
        tp_batch = jnp.full((xt.shape[0],), c["t_prev"], dtype=jnp.int32)
        out2 = model_fn(x_mid, tp_batch, **model_kwargs)
        p2 = self.predict(out2, x_mid, c_prev)
        bar_x_mid = c["sqrt_1p_sigma_prev2"] * x_mid
        d2 = (bar_x_mid - p2["pred_x0"]) / c["sigma_prev"]
        d = (d1 + d2) / 2.0
        bar_sample = bar_xt + d * (c["sigma_prev"] - c["sigma"])
        sample = bar_sample / c["sqrt_1p_sigma_prev2"]
        # full key set so `collect` accepts the same names as other samplers
        return {
            "sample": sample,
            "mean": sample,
            "var": jnp.zeros((), jnp.float32),
            "pred_x0": p2["pred_x0"],
            "pred_eps": p2["pred_eps"],
            "reverse_eps": jnp.zeros_like(sample),
        }

    def sample_loop(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        collect: Sequence[str] = (),
        start_step: int = 0,
        num_steps: Optional[int] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """(reference: diffusions/heun.py:104-131); rng is unused (ODE sampler)."""
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.sampler_tape().items()}
        S = tape["t"].shape[0]
        stop = S if num_steps is None else min(S, start_step + num_steps)
        tape = {k: v[start_step:stop] for k, v in tape.items()}
        # all rows except the last have t_prev >= 0 -> full predictor+corrector
        has_final = bool(stop == S)
        n2 = (stop - start_step) - (1 if has_final else 0)
        tape2 = {k: v[:n2] for k, v in tape.items()}

        def body(x, c):
            out = self._heun_step(model_fn, x, c, model_kwargs)
            return out["sample"], {k: out[k] for k in collect}

        x, ys = jax.lax.scan(body, init_noise.astype(jnp.float32), tape2)

        if has_final:
            # final pair (t=seq[0], t_prev=-1): single Euler predictor step
            c_last = {k: v[-1] for k, v in tape.items()}
            out = EulerSampler.denoise_step(
                self,
                model_fn(x, jnp.full((x.shape[0],), c_last["t"], dtype=jnp.int32), **model_kwargs),
                x,
                c_last,
                rng,
            )
            x = out["sample"]
            if collect:
                ys = {
                    k: jnp.concatenate([ys[k], out[k][None]], axis=0) if k in out else ys[k]
                    for k in collect
                }
        return x, ys
