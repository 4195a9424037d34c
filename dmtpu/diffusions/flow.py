"""Flow matching / rectified flow (beyond parity).

The reference repo is DDPM-family only; this adds the linear-interpolant
flow-matching objective (Lipman et al. 2023; Liu et al. 2023 "rectified
flow") and its ODE samplers as a third trainer/sampler family behind the
same model seam ``model_fn(xt, t_batch, **kwargs) -> velocity``
(reference: diffusions/ddpm.py:276 — the seam contract this class reuses).

Math (time ``u`` runs 0 = data -> 1 = noise):

    x_u      = (1 - u) * x0 + u * eps
    target v = dx/du = eps - x0
    pred_x0  = x_u - u * v          pred_eps = x_u + (1 - u) * v

Sampling integrates the ODE ``dx/du = v(x, u)`` from u=1 (pure noise) down
to u=0 on a precomputed host-side grid, as one ``jax.lax.scan`` — the same
tape-over-scan design as every other sampler here (dmtpu/diffusions/ddpm.py).

TPU notes: the scan body is one batched model call plus two fused axpys;
Heun doubles the model calls per step (2S NFE — unlike eps-parameterised
Karras-Heun there is no sigma=0 singularity, so the trapezoid correction is
applied on the final step too).  CFG runs as ONE 2B-batched call, like
``DDPMCFG``.

Integer-timestep compatibility: the model zoo embeds DDPM-style integer
timesteps, so the model is conditioned on ``t = u * total_steps`` and
``loss_func`` accepts the integer ``t ~ randint(total_steps)`` drawn by
``make_diffusion_loss_fn`` (dmtpu/parallel/train.py) unchanged — a flow
model trains with the exact same train step / CLI as a DDPM one, only the
config's ``diffusion.target`` changes.

``time_shift`` (SD3-style resolution shift, Esser et al. 2024): remaps
``u -> shift*u / (1 + (shift-1)*u)`` in BOTH the training draw and the
sampling grid, biasing time toward the high-noise region — the standard
knob for high-resolution latent flows (shift=3 at 1024^2).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.diffusions.ddpm import cfg_double_merge

Array = jax.Array
ModelFn = Callable[..., Array]


def _bcast(coef: Array, ndim: int) -> Array:
    coef = jnp.asarray(coef, jnp.float32)
    return coef.reshape(coef.shape + (1,) * (ndim - coef.ndim))


def _shift_u(u, shift: float):
    """SD3 timestep shift: identity at shift=1, pushes mass toward u=1."""
    if shift == 1.0:
        return u
    return shift * u / (1.0 + (shift - 1.0) * u)


class FlowMatching:
    """Linear-interpolant flow matching: velocity training + ODE sampling.

    Args:
        total_steps: the integer-timestep scale the model is conditioned on
            (training draws ``t in [0, total_steps)``; sampling feeds
            ``u * total_steps``).  1000 matches the DDPM zoo convention.
        respace_steps: number of ODE integration steps S for sampling.
        respace_type: step-grid spacing.  ``quad`` is the continuous
            analogue of DDPM quad respacing (grid = linspace**2, denser near
            the data end u=0); the discrete offset variants
            ``uniform``/``uniform-leading``/``uniform-trailing``/``uniform2``
            and ``linspace`` all coincide with the exact-endpoint uniform
            grid in continuous time (they only differ by integer index
            offsets in the DDPM-family samplers), so they are accepted and
            mapped to it rather than silently swallowed; anything else
            raises.
        solver: ``"euler"`` (S model calls) or ``"heun"`` (2S calls,
            second-order trapezoid).
        time_shift: SD3 resolution shift (1.0 = plain rectified flow).
        clip_denoised: clip the implied pred_x0 to [-1, 1] each step and
            re-derive the velocity from the clipped value (off by default:
            flows are usually latent-space).
    """

    _UNIFORM_TYPES = ("uniform", "uniform-leading", "uniform-trailing",
                      "uniform2", "linspace")

    def __init__(
        self,
        total_steps: int = 1000,
        respace_steps: int = 50,
        respace_type: str = "uniform",
        solver: str = "euler",
        time_shift: float = 1.0,
        clip_denoised: bool = False,
        **_: Any,
    ):
        if solver not in ("euler", "heun"):
            raise ValueError(f"Invalid solver: {solver}")
        if time_shift <= 0:
            raise ValueError(f"time_shift must be > 0, got {time_shift}")
        respace_type = respace_type or "uniform"
        if respace_type not in self._UNIFORM_TYPES + ("quad",):
            raise ValueError(
                f"Invalid respace_type for flow matching: {respace_type!r} "
                f"(supported: {self._UNIFORM_TYPES + ('quad',)})")
        self.total_steps = int(total_steps)
        self.respace_steps = int(respace_steps)
        self.respace_type = respace_type
        self.solver = solver
        self.time_shift = float(time_shift)
        self.clip_denoised = bool(clip_denoised)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _u_of_t(self, t: Array) -> Array:
        """Integer timestep -> (shifted) continuous time in [0, 1)."""
        u = jnp.asarray(t, jnp.float32) / float(self.total_steps)
        return _shift_u(u, self.time_shift)

    def diffuse(self, x0: Array, t: Array, eps: Array) -> Array:
        """x_u = (1-u) x0 + u eps at MODEL time ``t`` (shifted-u * total_steps).

        Same signature as ``DDPM.diffuse`` so SDEdit-style script code
        (reference: scripts/sample_sdedit.py:141-157) works on flows:
        ``t`` is on the model-conditioning scale — exactly what
        ``respaced_seq`` rows hold, which already have ``time_shift`` baked
        in — so ``diffuse(img, respaced_seq[k])`` followed by
        ``sample(start_step=row)`` lands on the tape's noise level for ANY
        shift.  (Re-applying ``_shift_u`` here, as ``loss_func`` does to its
        RAW uniform draw, would double-shift.)  At time_shift=1 the two
        scales coincide.
        """
        u = _bcast(jnp.asarray(t, jnp.float32) / float(self.total_steps), x0.ndim)
        return (1.0 - u) * x0 + u * eps

    def loss_func(
        self,
        model_fn: ModelFn,
        x0: Array,
        t: Array,
        eps: Optional[Array] = None,
        rng: Optional[Array] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Array:
        """Conditional flow-matching MSE: ||v_theta(x_u, t) - (eps - x0)||^2.

        ``t`` is integer [B] in [0, total_steps) — drop-in for the DDPM
        ``loss_func`` contract used by ``make_diffusion_loss_fn``.
        """
        model_kwargs = model_kwargs or {}
        if eps is None:
            eps = jax.random.normal(rng, x0.shape, x0.dtype)
        u = _bcast(self._u_of_t(t), x0.ndim)
        xu = (1.0 - u) * x0 + u * eps
        # model is conditioned on the SHIFTED time scaled back to timesteps,
        # so train/sample conditioning agree for any time_shift
        t_model = (u * float(self.total_steps)).reshape(x0.shape[0])
        pred = model_fn(xu, t_model, **model_kwargs)
        target = eps.astype(jnp.float32) - x0.astype(jnp.float32)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    # ------------------------------------------------------------------
    # sampling tape
    # ------------------------------------------------------------------
    @property
    def respaced_seq(self) -> np.ndarray:
        """Model-timestep grid (ascending), matching the DDPM-family
        attribute the CLIs use for step counting/labels
        (scripts/sample_uncond.py uses ``len(respaced_seq)``)."""
        u = self.sampler_tape()["u"]
        return np.ascontiguousarray((u * self.total_steps)[::-1])

    def sampler_tape(self) -> Dict[str, np.ndarray]:
        """Per-step rows in sampling order: u (current), u_next (< u).

        Host float64; the shift is applied to the uniform grid, keeping the
        endpoints u=1 / u=0 exact.
        """
        s = self.respace_steps
        grid = np.linspace(1.0, 0.0, s + 1, dtype=np.float64)
        if self.respace_type == "quad":
            # denser steps near the data end (u -> 0), the continuous
            # analogue of DDPM quad respacing; endpoints stay exact
            grid = grid ** 2
        grid = _shift_u(grid, self.time_shift)
        return {
            "u": grid[:-1].astype(np.float32),
            "u_next": grid[1:].astype(np.float32),
        }

    # ------------------------------------------------------------------
    # one ODE step (pure)
    # ------------------------------------------------------------------
    def _raw_velocity(
        self,
        model_fn: ModelFn,
        x: Array,
        u: Array,
        model_kwargs: Dict[str, Any],
    ) -> Array:
        """One model call (the CFG subclass overrides ONLY this)."""
        t_batch = jnp.full((x.shape[0],), u * float(self.total_steps), jnp.float32)
        return model_fn(x, t_batch, **model_kwargs).astype(jnp.float32)

    def _velocity(
        self,
        model_fn: ModelFn,
        x: Array,
        u: Array,
        model_kwargs: Dict[str, Any],
    ) -> Array:
        v = self._raw_velocity(model_fn, x, u, model_kwargs)
        if self.clip_denoised:
            # clip the implied x0 and re-derive v; at u=0 the division is
            # degenerate so the raw v passes through
            safe_u = jnp.maximum(u, 1e-6)
            x0 = jnp.clip(x - u * v, -1.0, 1.0)
            v = jnp.where(u > 0, (x - x0) / safe_u, v)
        return v

    def ode_step(
        self,
        model_fn: ModelFn,
        x: Array,
        c: Dict[str, Array],
        model_kwargs: Dict[str, Any],
    ) -> Dict[str, Array]:
        """x_u -> x_{u_next} with the configured solver."""
        u, u_next = c["u"], c["u_next"]
        du = u_next - u
        v1 = self._velocity(model_fn, x, u, model_kwargs)
        if self.solver == "euler":
            v = v1
        else:  # heun: trapezoid over the Euler proposal
            x_e = x + du * v1
            v2 = self._velocity(model_fn, x_e, u_next, model_kwargs)
            v = 0.5 * (v1 + v2)
        sample = x + du * v
        pred_x0 = x - u * v1
        return {"sample": sample, "pred_x0": pred_x0, "velocity": v1}

    # ------------------------------------------------------------------
    # the compiled sampling loop
    # ------------------------------------------------------------------
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
        """Integrate the ODE as one ``lax.scan`` (deterministic; ``rng``
        accepted for sampler-API uniformity and unused)."""
        del rng
        model_kwargs = model_kwargs or {}
        tape = {k: jnp.asarray(v) for k, v in self.sampler_tape().items()}
        s = tape["u"].shape[0]
        stop = s if num_steps is None else min(s, start_step + num_steps)
        tape = {k: v[start_step:stop] for k, v in tape.items()}

        def body(x, c):
            out = self.ode_step(model_fn, x, c, model_kwargs)
            return out["sample"], {k: out[k] for k in collect}

        final, ys = jax.lax.scan(body, init_noise.astype(jnp.float32), tape)
        return final, ys

    def sample(
        self,
        model_fn: ModelFn,
        init_noise: Array,
        rng: Optional[Array] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> Array:
        final, _ = self.sample_loop(model_fn, init_noise, rng, model_kwargs, **kwargs)
        return final

    def sample_inversion(
        self,
        model_fn: ModelFn,
        img: Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Array:
        """Data -> noise: integrate the same ODE with the tape reversed
        (u: 0 -> 1).  Exact inverse of Euler up to the solver's own
        discretization error — the flow analogue of DDIM inversion
        (reference: diffusions/ddim.py sample_inversion semantics)."""
        model_kwargs = model_kwargs or {}
        fwd = self.sampler_tape()
        tape = {
            "u": jnp.asarray(fwd["u_next"][::-1].copy()),
            "u_next": jnp.asarray(fwd["u"][::-1].copy()),
        }

        def body(x, c):
            out = self.ode_step(model_fn, x, c, model_kwargs)
            return out["sample"], None

        final, _ = jax.lax.scan(body, img.astype(jnp.float32), tape)
        return final


class FlowMatchingCFG(FlowMatching):
    """Classifier-free-guided flow sampling: ONE 2B-batched call per
    velocity evaluation, ``v = (1-s) v_uncond + s v_cond`` (the ``DDPMCFG``
    convention, reference: diffusions/ddpm.py:293-360 applied to velocity).

    Training uses the same label-dropout path as DDPM CFG training
    (``make_diffusion_loss_fn(p_uncond=...)``) — ``loss_func`` is inherited.
    """

    _UNCOND_KEY = "__cfg_uncond_conditioning__"

    def __init__(self, guidance_scale: float = 1.0, cond_kwarg: str = "y",
                 *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.guidance_scale = float(guidance_scale)
        self.cond_kwarg = cond_kwarg

    def _raw_velocity(self, model_fn, x, u, model_kwargs):
        """ONE 2B-batched call, [cond | uncond]; the shared ``_velocity``
        clip hook applies to the guided combination."""
        x2, merged = cfg_double_merge(
            x, model_kwargs, self.cond_kwarg, self._UNCOND_KEY)
        t2 = jnp.full((x2.shape[0],), u * float(self.total_steps), jnp.float32)
        v2 = model_fn(x2, t2, **merged).astype(jnp.float32)
        v_cond, v_uncond = jnp.split(v2, 2, axis=0)
        s = self.guidance_scale
        return (1.0 - s) * v_uncond + s * v_cond

    def sample_loop(self, model_fn, init_noise, rng=None,
                    uncond_conditioning: Any = None,
                    model_kwargs: Optional[Dict[str, Any]] = None, **kwargs):
        mk = dict(model_kwargs or {})
        mk[self._UNCOND_KEY] = uncond_conditioning
        return super().sample_loop(model_fn, init_noise, rng, mk, **kwargs)

    def sample(self, model_fn, init_noise, rng=None,
               uncond_conditioning: Any = None,
               model_kwargs: Optional[Dict[str, Any]] = None, **kwargs) -> Array:
        final, _ = self.sample_loop(model_fn, init_noise, rng,
                                    uncond_conditioning, model_kwargs, **kwargs)
        return final

    def sample_inversion(self, model_fn, img,
                         uncond_conditioning: Any = None,
                         model_kwargs: Optional[Dict[str, Any]] = None) -> Array:
        """Guided data -> noise: threads ``uncond_conditioning`` like
        ``sample`` so CFG ODE inversion is reachable (the flow analogue of
        ``DDIMCFG``'s guided inversion, dmtpu/diffusions/ddim.py)."""
        mk = dict(model_kwargs or {})
        mk[self._UNCOND_KEY] = uncond_conditioning
        return super().sample_inversion(model_fn, img, mk)
