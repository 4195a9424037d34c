"""DDIM sampler (+ inversion) and its classifier-free-guidance variant.

Same scan-over-tape architecture as ``dmtpu.diffusions.ddpm``; the DDIM
variance/mean scalars (reference: diffusions/ddim.py:57-86) and the inversion
coefficients (reference: diffusions/ddim.py:88-132) are precomputed in float64
and appended to the tape.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddpm import DDPM, DDPMCFG, Array, ModelFn


class DDIM(DDPM):
    """Denoising Diffusion Implicit Models.  (reference: diffusions/ddim.py:12-132)"""

    def __init__(self, *args: Any, eta: float = 0.0, **kwargs: Any):
        kwargs.setdefault("var_type", "fixed_small")  # unused by the step math
        super().__init__(*args, **kwargs)
        self.eta = float(eta)

    # ------------------------------------------------------------------
    def sampler_tape(self) -> Dict[str, np.ndarray]:
        tape = super().sampler_tape()
        # recompute in float64 from the (reversed) f32-truncation-free source
        seq = self.respaced_seq
        ac = self.alphas_cumprod[seq]
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        var = (self.eta ** 2) * (1.0 - ac_prev) / (1.0 - ac) * (1.0 - ac / ac_prev)
        dir_coef = np.sqrt(np.maximum(1.0 - ac_prev - var, 0.0))
        tape["ddim_var"] = var[::-1].astype(np.float32)
        tape["ddim_std"] = np.sqrt(var)[::-1].astype(np.float32)
        tape["ddim_dir_coef"] = dir_coef[::-1].astype(np.float32)
        return tape

    def denoise_step(self, model_output, xt, c, rng, objective=None):
        p = self.predict(model_output, xt, c, objective=objective)
        pred_x0, pred_eps = p["pred_x0"], p["pred_eps"]
        mean = c["sqrt_ac_prev"] * pred_x0 + c["ddim_dir_coef"] * pred_eps
        if self.eta == 0.0:
            # deterministic: statically skip the per-step normal draw
            reverse_eps = jnp.zeros_like(xt)
            sample = mean
        else:
            reverse_eps = jax.random.normal(rng, xt.shape, jnp.float32)
            sample = mean + c["nonzero"] * c["ddim_std"] * reverse_eps
        return {
            "sample": sample,
            "mean": mean,
            "var": c["ddim_var"],
            "pred_x0": pred_x0,
            "pred_eps": pred_eps,
            "reverse_eps": reverse_eps,
        }

    # ------------------------------------------------------------------
    # DDIM inversion: x_t -> x_{t+1} forward traversal (eta=0 only)
    # ------------------------------------------------------------------
    def inversion_tape(self) -> Dict[str, np.ndarray]:
        """Per-step coefficients for the forward (inversion) traversal.

        Row i: t = seq[i], t_next = seq[i+1]  (ascending;
        reference: diffusions/ddim.py:106-123).
        """
        seq = self.respaced_seq
        ac = self.alphas_cumprod
        t = seq[:-1]
        t_next = seq[1:]
        ac_t = ac[t]
        ac_next = ac[t_next]
        return {
            "t": t.astype(np.int32),
            "sqrt_ac": np.sqrt(ac_t).astype(np.float32),
            "sqrt_1m_ac": np.sqrt(1.0 - ac_t).astype(np.float32),
            "sqrt_recip_ac": np.sqrt(1.0 / ac_t).astype(np.float32),
            "sqrt_recipm1_ac": np.sqrt(1.0 / ac_t - 1.0).astype(np.float32),
            "sqrt_ac_next": np.sqrt(ac_next).astype(np.float32),
            "sqrt_1m_ac_next": np.sqrt(1.0 - ac_next).astype(np.float32),
        }

    def _inversion_model_output(self, model_fn, xt, c, model_kwargs) -> Array:
        t_batch = jnp.full((xt.shape[0],), c["t"], dtype=jnp.int32)
        return model_fn(xt, t_batch, **model_kwargs)

    def _inversion_step(self, model_fn, xt, c, model_kwargs) -> Dict[str, Array]:
        """x_t -> x_{t+1}.  (reference: diffusions/ddim.py:88-104)"""
        model_output = self._inversion_model_output(model_fn, xt, c, model_kwargs)
        p = self.predict(model_output, xt, c, objective=self._inversion_objective())
        sample = c["sqrt_ac_next"] * p["pred_x0"] + c["sqrt_1m_ac_next"] * p["pred_eps"]
        return {"sample": sample, "pred_x0": p["pred_x0"], "pred_eps": p["pred_eps"]}

    def _inversion_objective(self) -> Optional[str]:
        return None

    def sample_inversion_loop(
        self,
        model_fn: ModelFn,
        img: Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        collect: Sequence[str] = (),
    ) -> Tuple[Array, Dict[str, Array]]:
        if self.eta != 0.0:
            raise ValueError(f"DDIM inversion is only valid when eta=0, got {self.eta}")
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.inversion_tape().items()}

        def body(x, c):
            out = self._inversion_step(model_fn, x, c, model_kwargs)
            return out["sample"], {k: out[k] for k in collect}

        final, ys = jax.lax.scan(body, img.astype(jnp.float32), tape)
        return final, ys

    def sample_inversion(self, model_fn, img, model_kwargs=None, **kwargs) -> Array:
        final, _ = self.sample_inversion_loop(model_fn, img, model_kwargs, **kwargs)
        return final


class DDIMCFG(DDIM, DDPMCFG):
    """DDIM with classifier-free guidance, incl. guided inversion.

    (reference: diffusions/ddim.py:135-250).  Inherits the batched dual-branch
    model call from ``DDPMCFG`` and the DDIM step math from ``DDIM``.
    """

    def __init__(self, guidance_scale: float = 1.0, cond_kwarg: str = "y",
                 *args: Any, eta: float = 0.0, **kwargs: Any):
        # cooperative MRO walk (DDIM -> DDPMCFG -> DDPM) so every layer's
        # init logic runs: DDIM's eta/var_type defaulting, DDPMCFG's scale.
        super().__init__(*args, eta=eta, guidance_scale=guidance_scale,
                         cond_kwarg=cond_kwarg, **kwargs)

    # resolved from DDPMCFG via the MRO (DDIM defines neither):
    #   _model_step, sample_loop, sample

    def _inversion_objective(self):
        return "pred_eps"

    def _inversion_model_output(self, model_fn, xt, c, model_kwargs):
        pred_eps, _ = self._cfg_model_output(model_fn, xt, c, model_kwargs)
        return pred_eps

    def sample_inversion_loop(
        self,
        model_fn: ModelFn,
        img: Array,
        uncond_conditioning: Any = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ):
        mk = dict(model_kwargs or {})
        mk[self._UNCOND_KEY] = uncond_conditioning
        return DDIM.sample_inversion_loop(self, model_fn, img, mk, **kwargs)

    def sample_inversion(
        self,
        model_fn: ModelFn,
        img: Array,
        uncond_conditioning: Any = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> Array:
        final, _ = self.sample_inversion_loop(
            model_fn, img, uncond_conditioning, model_kwargs, **kwargs
        )
        return final
