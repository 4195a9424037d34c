"""Mask guidance (inpainting) + RePaint resampling.

Per-step: overwrite the known region with the ground truth noised to the
current level (reference: diffusions/guidance/mask_guidance.py:51-61).
RePaint's non-monotone forward/backward schedule
(reference: diffusions/guidance/mask_guidance.py:70-135) is precomputed on
host as a tape of (t1, t2, branch) rows; one ``lax.scan`` with ``lax.cond``
between the denoise branch (model call + guidance) and the one-step re-noise
branch runs the whole resampling chain compiled.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddim import DDIMCFG as _DDIMCFG_BASE
from dmtpu.diffusions.ddpm import Array, ModelFn
from dmtpu.diffusions.guidance.base import BaseGuidance


class MaskGuidance(BaseGuidance):
    def __init__(
        self,
        masked_image: Optional[Array] = None,
        mask: Optional[Array] = None,
        *args: Any,
        **kwargs: Any,
    ):
        """masked_image: [B,H,W,C]; mask: [B,H,W,1], 1=known, 0=unknown."""
        super().__init__(*args, **kwargs)
        self.masked_image = masked_image
        self.mask = mask

    def set_mask_and_image(self, masked_image: Array, mask: Array):
        self.masked_image = masked_image
        self.mask = mask

    def cond_fn_sample(self, out, xt, c, rng):
        if self.masked_image is None or self.mask is None:
            raise RuntimeError("Please call `set_mask_and_image()` before sampling.")
        img = jnp.asarray(self.masked_image, jnp.float32)
        eps = jax.random.normal(rng, img.shape, jnp.float32)
        # noised to level t_prev; at the final step (t==0) use the clean image
        diffused = c["sqrt_ac_prev"] * img + c["sqrt_1m_ac_prev"] * eps
        noisy_known = c["nonzero"] * diffused + (1.0 - c["nonzero"]) * img
        return (noisy_known - out["sample"]) * jnp.asarray(self.mask, jnp.float32)

    # ------------------------------------------------------------------
    # RePaint
    # ------------------------------------------------------------------
    def get_resample_seq(self, resample_r: int = 10, resample_j: int = 10) -> list:
        """RePaint Fig. 9 jump schedule over the respaced sequence.

        (reference: diffusions/guidance/mask_guidance.py:111-135)
        """
        t_T = len(self.respaced_seq)
        jumps = {}
        for j in range(0, t_T - resample_j, resample_j):
            jumps[j] = resample_r - 1
        t = t_T
        ts = []
        while t >= 1:
            t = t - 1
            ts.append(int(self.respaced_seq[t]))
            if jumps.get(t, 0) > 0:
                jumps[t] = jumps[t] - 1
                for _ in range(resample_j):
                    t = t + 1
                    ts.append(int(self.respaced_seq[t]))
        return ts

    def resample_tape(self, resample_r: int = 10, resample_j: int = 10) -> Dict[str, np.ndarray]:
        """Tape over consecutive (t1, t2) pairs with a denoise/renoise flag."""
        seq1 = self.get_resample_seq(resample_r, resample_j)
        seq2 = seq1[1:] + [-1]
        t1 = np.asarray(seq1, np.int64)
        t2 = np.asarray(seq2, np.int64)
        denoise = t1 > t2
        # denoise rows: full coefficient set for (t1 -> t2)
        tape = self.pair_tape(t1, t2)
        # renoise rows: q(x_{t2} | x_{t1}) one-step forward
        # (reference: diffusions/guidance/mask_guidance.py:63-68)
        ac1 = self.alphas_cumprod[t1]
        ac2 = np.where(t2 < self.total_steps, self.alphas_cumprod[np.minimum(np.maximum(t2, 0), self.total_steps - 1)], 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            alphas_next = np.where(denoise, 1.0, ac2 / ac1)
        tape["renoise_sqrt_alpha"] = np.sqrt(np.maximum(alphas_next, 0.0)).astype(np.float32)
        tape["renoise_sqrt_1m_alpha"] = np.sqrt(np.maximum(1.0 - alphas_next, 0.0)).astype(np.float32)
        tape["is_denoise"] = denoise.astype(np.float32)
        # Renoise rows carry placeholder (t1 -> t2) denoise coefficients that
        # may be NaN/inf (t2 = t1+1 runs the chain backwards); the scan's
        # lax.cond never reads them, but XLA still wants finite constants.
        # Scrub ONLY those rows — a non-finite coefficient on a *denoise* row
        # is a real schedule bug and must fail loudly.
        for k, v in tape.items():
            if v.dtype == np.int32 or k.startswith("renoise") or k == "is_denoise":
                continue
            finite = np.isfinite(v)
            row_denoise = denoise.reshape(denoise.shape + (1,) * (v.ndim - 1))
            if not np.all(finite | ~row_denoise):
                raise FloatingPointError(
                    f"non-finite '{k}' coefficient on a denoise row: "
                    f"rows {np.unique(np.argwhere(~finite & row_denoise)[:, 0])}")
            tape[k] = np.where(finite, v, 0.0).astype(v.dtype)
        return tape

    def resample_loop(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Array,
        resample_r: int = 10,
        resample_j: int = 10,
        model_kwargs: Optional[Dict[str, Any]] = None,
        collect: Sequence[str] = (),
    ) -> Tuple[Array, Dict[str, Array]]:
        """(reference: diffusions/guidance/mask_guidance.py:70-95)"""
        unsupported = [k for k in collect if k != "sample"]
        if unsupported:
            raise ValueError(
                f"resample_loop can only collect 'sample': {unsupported} are "
                "undefined on the schedule's renoise rows (no model call there)")
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.resample_tape(resample_r, resample_j).items()}
        n = int(tape["t"].shape[0])
        keys = jax.random.split(rng, (n, 3))  # works for typed and legacy keys

        def denoise_branch(args):
            x, c, key = args
            out = self._model_step(model_fn, x, c, key[0], model_kwargs)
            out = self.apply_guidance(out, x, c, key[1])
            return out["sample"]

        def renoise_branch(args):
            x, c, key = args
            eps = jax.random.normal(key[2], x.shape, jnp.float32)
            return c["renoise_sqrt_alpha"] * x + c["renoise_sqrt_1m_alpha"] * eps

        def body(x, row):
            c, key = row
            new_x = jax.lax.cond(c["is_denoise"] > 0.5, denoise_branch, renoise_branch, (x, c, key))
            return new_x, {k: new_x for k in collect if k == "sample"}

        final, ys = jax.lax.scan(body, init_noise.astype(jnp.float32), (tape, keys))
        return final, ys

    def resample(self, model_fn, init_noise, rng, resample_r=10, resample_j=10,
                 model_kwargs=None, **kwargs) -> Array:
        final, _ = self.resample_loop(model_fn, init_noise, rng, resample_r,
                                      resample_j, model_kwargs, **kwargs)
        return final


class MaskGuidanceDDIMCFG(MaskGuidance, _DDIMCFG_BASE):
    """Latent inpainting with classifier-free guidance (beyond parity).

    Cooperative-MRO composition: MaskGuidance contributes the per-step
    known-region overwrite (``cond_fn_sample``), DDIMCFG the batched
    2B cond+uncond call and DDIM stepping — the hooks meet in the shared
    ``sample_loop``/``apply_guidance`` seam, so the whole inpainting-CFG
    reverse process is still one ``lax.scan``.  A fully-known mask
    reproduces the ground-truth image exactly at t=0 (tested); used by
    ``scripts/sample_sd.py --inpaint_image/--inpaint_mask`` in LATENT space
    (mask downsampled to the latent grid).
    """
