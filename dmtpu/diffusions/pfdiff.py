"""PFDiff-1: training-free sampler acceleration via past + future scores.

Technique from PAPERS.md ("PFDiff: Training-Free Acceleration of Diffusion
Models Combining Past and Future Scores", arXiv 2408.08822) — no reference
counterpart (beyond parity).  The observation: eps predictions at adjacent
timesteps are highly correlated, so a solver step need not spend a fresh
model call on every grid point.  Each PFDiff-1 iteration covers TWO grid
transitions with ONE model call:

    1. springboard:  jump t_i -> t_{i+1} using the BUFFERED eps from the
       previous iteration (0 NFE);
    2. future score: evaluate the model at the springboard (t_{i+1});
    3. foresight:    update the ORIGINAL state x_{t_i} -> x_{t_{i+2}} using
       that future eps (a midpoint-flavoured correction, Nesterov-style).

On a respaced grid of S steps this costs 1 (anchor) + floor((S-1)/2) +
((S-1) % 2) model calls — ~S/2 NFE for the same grid resolution.

TPU-native design: identical scan-over-tape architecture as the rest of
``dmtpu.diffusions`` — the three coefficient rows each iteration needs
(springboard jump, mid-point predict, full jump) are precomputed on host in
float64 by ``DDPM.pair_tape`` and scanned in one compiled loop.  Everything
is deterministic (DDIM eta=0), so no per-step RNG is threaded.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddim import DDIM, DDIMCFG
from dmtpu.diffusions.ddpm import Array, ModelFn


class PFDiffDDIM(DDIM):
    """PFDiff-1 over the deterministic DDIM solver (eta=0 only)."""

    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        if self.eta != 0.0:
            raise ValueError(f"PFDiff requires the deterministic DDIM solver (eta=0), got eta={self.eta}")

    # ------------------------------------------------------------------
    # tape construction (host, float64 via pair_tape)
    # ------------------------------------------------------------------
    def pfdiff_tapes(self) -> Tuple[
        Dict[str, np.ndarray],
        Optional[Dict[str, np.ndarray]],
        Optional[Dict[str, np.ndarray]],
        Optional[Dict[str, np.ndarray]],
        Optional[Dict[str, np.ndarray]],
    ]:
        """(anchor, spring[K], mid[K], full[K], trail) coefficient rows.

        Positions 0..S-1 are the respaced timesteps in sampling order
        (t descending); position S is clean (-1).  The anchor is the plain
        DDIM step 0 -> 1; pair k starts at position i = 1 + 2k and covers
        i -> i+2 with one model call at i+1; a trailing plain step covers
        the last transition when S is even.
        """
        ext = np.concatenate([self.respaced_seq[::-1], [-1]])  # [S+1]
        S = len(ext) - 1
        anchor = self.pair_tape(ext[0:1], ext[1:2])
        if S == 1:
            return anchor, None, None, None, None

        starts = np.arange(1, S - 1, 2)  # pair start positions i (i+2 <= S)
        spring = mid = full = None
        if len(starts):
            spring = self.pair_tape(ext[starts], ext[starts + 1])
            mid = self.pair_tape(ext[starts + 1], ext[starts + 2])
            full = self.pair_tape(ext[starts], ext[starts + 2])
        i_end = 1 + 2 * len(starts)
        trail = None
        if i_end == S - 1:  # one transition left: plain DDIM step
            trail = self.pair_tape(ext[i_end:i_end + 1], ext[i_end + 1:i_end + 2])
        return anchor, spring, mid, full, trail

    @property
    def nfe(self) -> int:
        """Model evaluations one ``sample`` call costs (vs DDIM's S)."""
        S = len(self.respaced_seq)
        return 1 + max(0, (S - 1) // 2) + ((S - 1) % 2 if S > 1 else 0)

    # ------------------------------------------------------------------
    # building blocks (pure; rows are dicts of f32 scalars)
    # ------------------------------------------------------------------
    def _jump_with_eps(self, eps: Array, x: Array, c: Dict[str, Array]):
        """Deterministic DDIM jump c['t'] -> c's t_prev given eps at t.

        Routes through ``predict`` so ``clip_denoised`` keeps the exact
        semantics of every other sampler in the package.
        """
        p = self.predict(eps, x, c, objective="pred_eps")
        x_next = c["sqrt_ac_prev"] * p["pred_x0"] + c["sqrt_1m_ac_prev"] * p["pred_eps"]
        return x_next, p

    def _eps_at(self, model_fn: ModelFn, x: Array, c: Dict[str, Array],
                model_kwargs: Dict[str, Any]) -> Array:
        """One model call at row ``c``'s t, converted to eps-space."""
        t_batch = jnp.full((x.shape[0],), c["t"], dtype=jnp.int32)
        out = model_fn(x, t_batch, **model_kwargs)
        return self.predict(out, x, c)["pred_eps"]

    # ------------------------------------------------------------------
    # the compiled sampling loop
    # ------------------------------------------------------------------
    def sample_loop(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        collect: Sequence[str] = (),
    ) -> Tuple[Array, Dict[str, Array]]:
        """PFDiff-1 reverse process: anchor step, then one scan over pairs.

        ``collect`` stacks per-PAIR outputs of the foresight update (keys:
        sample / pred_x0 / pred_eps) — note the leading axis is the number
        of pairs, not S.  ``rng`` is accepted for API symmetry but unused
        (the solver is deterministic).
        """
        del rng  # deterministic (eta=0)
        model_kwargs = model_kwargs or {}
        anchor, spring, mid, full, trail = self.pfdiff_tapes()
        dev = lambda tape: {k: jnp.asarray(v) for k, v in tape.items()}  # noqa: E731
        row0 = lambda tape: {k: jnp.asarray(v[0]) for k, v in tape.items()}  # noqa: E731

        x = init_noise.astype(jnp.float32)
        c0 = row0(anchor)
        eps = self._eps_at(model_fn, x, c0, model_kwargs)
        x, _ = self._jump_with_eps(eps, x, c0)

        ys: Dict[str, Array] = {k: jnp.zeros((0,) + x.shape, jnp.float32) for k in collect}
        if spring is not None:
            def body(carry, row):
                x, eps_buf = carry
                cs, cm, cf = row
                x_spring, _ = self._jump_with_eps(eps_buf, x, cs)
                eps_new = self._eps_at(model_fn, x_spring, cm, model_kwargs)
                x_next, p = self._jump_with_eps(eps_new, x, cf)
                out = {"sample": x_next, "pred_x0": p["pred_x0"], "pred_eps": p["pred_eps"]}
                return (x_next, eps_new), {k: out[k] for k in collect}

            (x, eps), ys = jax.lax.scan(
                body, (x, eps), (dev(spring), dev(mid), dev(full)))

        if trail is not None:
            ct = row0(trail)
            eps_t = self._eps_at(model_fn, x, ct, model_kwargs)
            x, p = self._jump_with_eps(eps_t, x, ct)
            if collect:
                out = {"sample": x, "pred_x0": p["pred_x0"], "pred_eps": p["pred_eps"]}
                ys = {k: jnp.concatenate([ys[k], out[k][None]]) for k in collect}
        return x, ys

    def sample(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> Array:
        final, _ = self.sample_loop(model_fn, init_noise, rng, model_kwargs, **kwargs)
        return final


class PFDiffDDIMCFG(PFDiffDDIM, DDIMCFG):
    """PFDiff-1 with classifier-free guidance.

    The buffered/future score is the GUIDED eps (the quantity the underlying
    DDIM-CFG solver integrates), produced by ``DDPMCFG``'s single batched
    2B-call — so each pair costs one doubled-batch model call.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        if kwargs.get("guidance_interval") is not None:
            # would be silently ignored: PFDiff evaluates scores through
            # _eps_at, not DDPMCFG._model_step where the interval gate lives
            raise NotImplementedError(
                "guidance_interval is supported by DDPMCFG/DDIMCFG only; the "
                "PFDiff score buffer here needs interval-aware rework")
        super().__init__(*args, **kwargs)

    def _eps_at(self, model_fn, x, c, model_kwargs):
        pred_eps, _ = self._cfg_model_output(model_fn, x, c, model_kwargs)
        return pred_eps

    # These overrides are REQUIRED, not redundant: without them the MRO
    # resolves sample_loop/sample to PFDiffDDIM's (uncond-less) signatures,
    # which would silently bind uncond_conditioning to model_kwargs.  They
    # mirror DDIMCFG's threading of the uncond branch under the reserved
    # model_kwargs key, then run PFDiffDDIM's loop explicitly.
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
        return PFDiffDDIM.sample_loop(self, model_fn, init_noise, rng, mk, **kwargs)

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
