"""DPM-Solver++(2M): second-order multistep ODE sampler (beyond parity).

Lu et al., "DPM-Solver++: Fast Solver for Guided Sampling of Diffusion
Probabilistic Models" (arXiv:2211.01095), data-prediction multistep variant —
the de-facto production sampler: ~20 NFE matches DDIM-50 quality, a direct
serving-throughput lever on top of the reference's sampler family
(reference: diffusions/ — DDPM/DDIM/Euler/Heun only).

TPU-native shape: all per-step scalars (sigma ratios, e^{-h} terms, the
multistep extrapolation weights) are precomputed on host in float64 from the
respaced sequence; the whole reverse process is ONE `lax.scan` whose carry
is ``(x, prev_x0)``.  In the VP/DDPM discrete setting:

    alpha_t = sqrt(abar_t),  sigma_t = sqrt(1 - abar_t),
    lambda_t = log(alpha_t / sigma_t),  h_i = lambda_{prev,i} - lambda_{cur,i}

    x_{prev} = (sigma_prev / sigma_cur) x  +  alpha_prev (1 - e^{-h}) D_i
    D_i      = (1 + 1/(2 r_i)) x0_i - (1/(2 r_i)) x0_{i-1},  r_i = h_{i-1}/h_i

The first step and the final step (t_prev = -1, sigma_prev = 0, h = inf)
use the first-order update (D = x0), matching standard lower-order-final
practice; the final step's limit is x = extrapolated x0 exactly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddpm import DDPM, DDPMCFG, Array, ModelFn


class DPMSolverPP(DDPM):
    """DPM-Solver++(2M) for the DDPM-like diffusion process (ODE; rng unused)."""

    def sampler_tape(self) -> Dict[str, np.ndarray]:
        tape = super().sampler_tape()
        seq = self.respaced_seq.astype(np.int64)
        ac = self.alphas_cumprod[seq]              # float64, t ascending
        ac_prev = np.concatenate([[1.0], ac[:-1]])

        alpha, sigma = np.sqrt(ac), np.sqrt(1.0 - ac)
        alpha_p, sigma_p = np.sqrt(ac_prev), np.sqrt(1.0 - ac_prev)
        with np.errstate(divide="ignore"):
            lam = np.log(alpha / sigma)
            lam_p = np.log(alpha_p / np.where(sigma_p == 0, np.nan, sigma_p))
        # rows in SAMPLING order (t descending): row i steps seq[-1-i] -> prev
        h = (lam_p - lam)[::-1]                    # h[last] = inf (sigma_prev=0)
        sigma_ratio = (np.where(sigma == 0, 0.0, sigma_p / sigma))[::-1]
        e_h = np.where(np.isfinite(h), np.exp(-np.where(np.isfinite(h), h, 0.0)), 0.0)
        alpha_e = alpha_p[::-1] * (1.0 - e_h)

        n = len(seq)
        c1 = np.ones(n)
        c2 = np.zeros(n)
        prev_h = None  # last usable step width (quad respacing yields
        # duplicate adjacent timesteps -> h=0 no-op rows that must not feed r)
        for i in range(n):
            if h[i] == 0.0 or not np.isfinite(h[i]):
                continue  # no-op row / final step to t=-1: keep 1st order
            if prev_h is not None:
                r = prev_h / h[i]
                c1[i] = 1.0 + 1.0 / (2.0 * r)
                c2[i] = -1.0 / (2.0 * r)
            prev_h = h[i]

        tape["dpm_sigma_ratio"] = sigma_ratio.astype(np.float32)
        tape["dpm_alpha_e"] = alpha_e.astype(np.float32)
        tape["dpm_c1"] = c1.astype(np.float32)
        tape["dpm_c2"] = c2.astype(np.float32)
        return tape

    def _x0_step(self, model_fn, x, c, model_kwargs) -> Array:
        """One model call -> pred_x0 (the quantity the solver integrates)."""
        t_batch = jnp.full((x.shape[0],), c["t"], dtype=jnp.int32)
        out = model_fn(x, t_batch, **model_kwargs)
        return self.predict(out, x, c)["pred_x0"]

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
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.sampler_tape().items()}
        S = tape["t"].shape[0]
        stop = S if num_steps is None else min(S, start_step + num_steps)
        tape = {k: v[start_step:stop] for k, v in tape.items()}
        if start_step != 0:
            # multistep extrapolation weights assume the full prefix; restart
            # as first-order on the first executed row (SDEdit-style entry)
            tape["dpm_c1"] = tape["dpm_c1"].at[0].set(1.0)
            tape["dpm_c2"] = tape["dpm_c2"].at[0].set(0.0)

        def body(carry, c):
            x, prev_x0 = carry
            x0 = self._x0_step(model_fn, x, c, model_kwargs)
            d = c["dpm_c1"] * x0 + c["dpm_c2"] * prev_x0
            x_next = c["dpm_sigma_ratio"] * x + c["dpm_alpha_e"] * d
            outs = {
                "sample": x_next,
                "mean": x_next,
                "var": jnp.zeros((), jnp.float32),
                "pred_x0": x0,
                "pred_eps": jnp.zeros_like(x_next),
                "reverse_eps": jnp.zeros_like(x_next),
            }
            return (x_next, x0), {k: outs[k] for k in collect}

        x0_init = jnp.zeros_like(init_noise, dtype=jnp.float32)
        (x, _), ys = jax.lax.scan(
            body, (init_noise.astype(jnp.float32), x0_init), tape)
        return x, ys

    def sample(self, model_fn, init_noise, rng, model_kwargs=None, **kwargs) -> Array:
        final, _ = self.sample_loop(model_fn, init_noise, rng, model_kwargs, **kwargs)
        return final


class DPMSolverPPCFG(DPMSolverPP, DDPMCFG):
    """DPM-Solver++(2M) with classifier-free guidance (beyond parity).

    The production text-to-image serving combination: ~20 NFE CFG sampling.
    Inherits the single batched cond+uncond model call from ``DDPMCFG``
    (guidance combined on eps, the standard CFG quantity) and converts the
    guided eps to the x0 the solver integrates.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        if kwargs.get("guidance_interval") is not None:
            # would be silently ignored: this solver integrates through
            # _x0_step, not DDPMCFG._model_step where the interval gate lives
            raise NotImplementedError(
                "guidance_interval is supported by DDPMCFG/DDIMCFG only; the "
                "multi-step solver history here needs interval-aware rework")
        super().__init__(*args, **kwargs)

    def _x0_step(self, model_fn, x, c, model_kwargs) -> Array:
        pred_eps, _ = self._cfg_model_output(model_fn, x, c, model_kwargs)
        return self.predict(pred_eps, x, c, objective="pred_eps")["pred_x0"]

    def sample_loop(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        uncond_conditioning: Any = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ):
        mk = dict(model_kwargs or {})
        mk[self._UNCOND_KEY] = uncond_conditioning
        return DPMSolverPP.sample_loop(self, model_fn, init_noise, rng,
                                       mk, **kwargs)

    def sample(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        uncond_conditioning: Any = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> Array:
        final, _ = self.sample_loop(
            model_fn, init_noise, rng, uncond_conditioning, model_kwargs, **kwargs)
        return final
