"""FlowDPM: DPM-Solver++(2M) for the rectified-flow family (beyond parity).

The flow analogue of ``dmtpu/diffusions/dpm_solver.py`` — the SD3/Flux
ecosystem's fast sampler: second-order MULTISTEP data-prediction updates at
one model call per step, so ~16-20 NFE matches Heun quality (which costs
2S calls).  The reference repo has neither flows nor DPM solvers
(reference: diffusions/ — DDPM/DDIM/Euler/Heun only).

Math.  The linear interpolant ``x_u = (1-u) x0 + u eps`` is a VP-style
process with ``alpha_u = 1-u``, ``sigma_u = u``; its half-log-SNR is
``lambda_u = log((1-u)/u)``.  DPM-Solver++'s exact variation-of-constants
update in data-prediction form carries over verbatim:

    x_{next} = (sigma_next / sigma) x + alpha_next (1 - e^{-h}) D
    h        = lambda_next - lambda
    D        = (1 + 1/(2r)) x0_i - (1/(2r)) x0_{i-1},   r = h_{i-1} / h_i

with ``x0 = x - u v`` recovered from the model's velocity.  The endpoints
are exact limits rather than special cases: at u=1 (pure noise) lambda is
-inf so h=inf and the first step is the interpolant re-anchoring
``x_1 = u_1 x + (1-u_1) x0``; at u_next=0 h=inf and the final step returns
the extrapolated x0 exactly (lower-order-final, as in dpm_solver.py).

TPU-native shape (same as every sampler here): all per-step scalars are
precomputed host-side in float64 — infinities resolved BEFORE the f32 tape
— and the whole reverse process is one ``lax.scan`` with carry
``(x, prev_x0)``.  CFG inherits the ONE 2B-batched velocity call from
``FlowMatchingCFG``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.flow import Array, FlowMatching, FlowMatchingCFG, ModelFn


class FlowDPMSolver(FlowMatching):
    """DPM-Solver++(2M) over the rectified-flow ODE (deterministic).

    Accepts the ``FlowMatching`` constructor surface except ``solver`` (the
    multistep update IS the solver; the inherited attribute is pinned to
    "euler" so utility paths like ``sample_inversion`` stay valid — inversion
    falls back to first-order Euler, documented).

    Grid guidance (measured on the analytic Gaussian-flow oracle,
    tests/test_flow_dpm.py): the u-uniform grid's endpoint lambda-gaps do
    not shrink with S, so the decay is grid-sensitive below ~16 steps;
    ``respace_type="quad"`` (denser near the data end) is the better
    operating point for S >= 16 and reaches ~1e-3 max-err by 28 steps —
    use quad for serving, uniform only for very low step counts (~10-12,
    where it matches Heun at half the NFE).
    """

    def __init__(self, *args: Any, **kwargs: Any):
        if kwargs.pop("solver", None) not in (None, "dpm"):
            raise ValueError("FlowDPMSolver is itself the solver; do not "
                             "pass solver= (or pass 'dpm')")
        super().__init__(*args, solver="euler", **kwargs)

    def sampler_tape(self) -> Dict[str, np.ndarray]:
        tape = super().sampler_tape()
        u = tape["u"].astype(np.float64)
        u_next = tape["u_next"].astype(np.float64)
        with np.errstate(divide="ignore"):
            lam = np.log((1.0 - u) / u)            # -inf at u=1
            lam_n = np.log((1.0 - u_next) /
                           np.where(u_next == 0, np.nan, u_next))
        lam_n = np.where(u_next == 0, np.inf, lam_n)
        h = lam_n - lam                            # inf on first/last rows
        sigma_ratio = u_next / u                   # u>0 for every CURRENT row
        e_h = np.where(np.isfinite(h), np.exp(-np.where(np.isfinite(h), h, 0.0)), 0.0)
        alpha_e = (1.0 - u_next) * (1.0 - e_h)

        n = len(u)
        c1 = np.ones(n)
        c2 = np.zeros(n)
        prev_h = None  # infinite-h rows stay first-order and must not feed r
        for i in range(n):
            if h[i] == 0.0 or not np.isfinite(h[i]):
                continue
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

    def _x0_step(self, model_fn: ModelFn, x: Array, c: Dict[str, Array],
                 model_kwargs: Dict[str, Any]) -> Array:
        """One (possibly CFG-batched) velocity call -> pred_x0."""
        v = self._velocity(model_fn, x, c["u"], model_kwargs)
        return x - c["u"] * v

    def sample_loop(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Optional[Array] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        collect: Sequence[str] = (),
        start_step: int = 0,
        num_steps: Optional[int] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        del rng
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.sampler_tape().items()}
        s = tape["u"].shape[0]
        stop = s if num_steps is None else min(s, start_step + num_steps)
        tape = {k: v[start_step:stop] for k, v in tape.items()}
        if start_step != 0:
            # multistep weights assume the full prefix ran; restart as
            # first-order on the first executed row (SDEdit-style entry)
            tape["dpm_c1"] = tape["dpm_c1"].at[0].set(1.0)
            tape["dpm_c2"] = tape["dpm_c2"].at[0].set(0.0)

        def body(carry, c):
            x, prev_x0 = carry
            x0 = self._x0_step(model_fn, x, c, model_kwargs)
            d = c["dpm_c1"] * x0 + c["dpm_c2"] * prev_x0
            x_next = c["dpm_sigma_ratio"] * x + c["dpm_alpha_e"] * d
            # x0 = x - u v with u > 0 on every current row, so the model's
            # (possibly CFG-mixed) velocity is exactly recoverable
            outs = {"sample": x_next, "pred_x0": x0,
                    "velocity": (x - x0) / c["u"]}
            return (x_next, x0), {k: outs[k] for k in collect}

        x0_init = jnp.zeros_like(init_noise, dtype=jnp.float32)
        (final, _), ys = jax.lax.scan(
            body, (init_noise.astype(jnp.float32), x0_init), tape)
        return final, ys


class FlowDPMSolverCFG(FlowMatchingCFG, FlowDPMSolver):
    """FlowDPM with classifier-free guidance: the SD3-class production
    serving combination (~20 NFE CFG text-to-image).

    MRO: ``FlowMatchingCFG`` contributes the ONE 2B-batched guided velocity
    (``_raw_velocity``) and the ``uncond_conditioning`` threading;
    ``FlowDPMSolver`` contributes the multistep tape/scan.
    """
