"""DeepCache serving loop: cached-UNet sampling (training-free speedup).

Deep UNet features drift slowly between adjacent sampler steps (Ma et al.
2023; PAPERS.md block-caching family).  ``SDUNetModel`` exposes DeepCache
full/shallow passes (``dc_skip`` / ``dc_cached`` — models/stablediffusion/
unet.py); this module owns the scanned sampler loop that alternates them:
the full UNet every ``interval``-th step, the shallow slice (first/last
``dc_skip`` skip-levels around the cached deep feature) in between.

Beyond reference parity: the reference has no serving-acceleration layer.
Quality/NFE trade-off is the paper's; the loop is exact when
``interval=1`` (tested) and identical in structure to
``DDPM.sample_loop``'s scan otherwise.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def deepcache_sample(
    diffuser,
    full_fn: Callable[[Array, Array], Tuple[Array, Array]],
    shallow_fn: Callable[[Array, Array, Array], Array],
    init_noise: Array,
    rng: Array,
    interval: int = 2,
    postprocess: Optional[Callable[[Array, Array, Dict[str, Array]], Array]] = None,
) -> Array:
    """Run the diffuser's reverse tape with DeepCache model dispatch.

    ``full_fn(x, t_batch) -> (model_out, cache)``;
    ``shallow_fn(x, t_batch, cache) -> model_out`` (close over any
    conditioning — context/y — in the callables).
    Step 0 always runs full (there is no cache yet); afterwards every
    ``interval``-th step refreshes the cache, the rest reuse it.
    ``diffuser`` supplies the step math via its tape + ``denoise_step``
    (DDIM/DDPM/Euler all expose that seam).

    ``postprocess(model_out, x, c) -> model_out`` (optional) runs before the
    denoise step with the tape row ``c`` in hand — the CFG seam: a 2B-batched
    full/shallow output can be split, per-branch ``diffuser.predict``-ed
    (so ``clip_denoised`` clips each branch exactly like ``DDPMCFG``) and
    combined into the B-sized guided eps.  interval=1 with that postprocess
    is trajectory-exact vs ``DDIMCFG.sample`` (tested).
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    tape = {k: jnp.asarray(v) for k, v in diffuser.sampler_tape().items()}
    n = int(tape["t"].shape[0])
    # Same key derivation as DDPM.sample_loop (ddpm.py): key[0] drives the
    # reverse noise, key[1] the guidance hook — interval=1 is then
    # trajectory-exact vs diffuser.sample() for stochastic samplers and
    # guidance subclasses too, not just deterministic DDIM.
    keys = jax.random.split(rng, (n, 2))
    x = init_noise.astype(jnp.float32)
    b = x.shape[0]

    def denoise(model_out, xc, c, key):
        if postprocess is not None:
            model_out = postprocess(model_out, xc, c)
        out = diffuser.denoise_step(model_out, xc, c, key[0])
        out = diffuser.apply_guidance(out, xc, c, key[1])
        return out["sample"]

    # step 0: full pass, establishes the cache (and its shape for the scan)
    c0 = {k: v[0] for k, v in tape.items()}
    t0 = jnp.full((b,), c0["t"], jnp.int32)
    out0, cache = full_fn(x, t0)
    x = denoise(out0, x, c0, keys[0])
    if n == 1:
        return x

    rest = {k: v[1:] for k, v in tape.items()}
    steps = jnp.arange(1, n)

    def body(carry, row):
        xc, u = carry
        c, key, i = row
        t_batch = jnp.full((b,), c["t"], jnp.int32)

        def full(xc, u):
            return full_fn(xc, t_batch)

        def shallow(xc, u):
            return shallow_fn(xc, t_batch, u), u

        out, u = jax.lax.cond(i % interval == 0, full, shallow, xc, u)
        xc = denoise(out, xc, c, key)
        return (xc, u), None

    (x, _), _ = jax.lax.scan(body, (x, cache), (rest, keys[1:], steps))
    return x


def pfdiff_deepcache_sample(
    diffuser,
    full_fn: Callable[[Array, Array], Tuple[Array, Array]],
    shallow_fn: Callable[[Array, Array, Array], Array],
    init_noise: Array,
    interval: int = 2,
    eps_fn: Optional[Callable[[Array, Array, Dict[str, Array]], Array]] = None,
) -> Array:
    """PFDiff-1 grid traversal with DeepCache model dispatch.

    Composition of the two training-free serving accelerations — the cost
    reduction is multiplicative: PFDiff-1 spends ~S/2 model calls on an
    S-step DDIM grid, and DeepCache makes all but every ``interval``-th of
    those calls a shallow cached pass.

    ``diffuser`` must be a ``PFDiffDDIM`` (deterministic, eta=0 — hence no
    rng argument); ``full_fn(x, t_batch) -> (model_out, cache)`` and
    ``shallow_fn(x, t_batch, cache) -> model_out`` close over conditioning
    exactly as in ``deepcache_sample``.  Model-call 0 (the PFDiff anchor)
    always runs full to establish the cache; ``interval=1`` reproduces plain
    ``PFDiffDDIM.sample`` exactly (tested).

    ``eps_fn(model_out, x, c) -> eps`` (optional) replaces the default
    ``diffuser.predict(...)["pred_eps"]`` — the CFG seam: a 2B-batched
    full/shallow output is split, per-branch predicted and combined into the
    guided eps exactly as ``PFDiffDDIMCFG._eps_at`` does; interval=1 with
    that ``eps_fn`` is trajectory-exact vs ``PFDiffDDIMCFG.sample`` (tested).
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    anchor, sp_t, mid_t, fl_t, trail = diffuser.pfdiff_tapes()
    dev = lambda tape: {k: jnp.asarray(v) for k, v in tape.items()}  # noqa: E731
    row0 = lambda tape: {k: jnp.asarray(v[0]) for k, v in tape.items()}  # noqa: E731

    x = init_noise.astype(jnp.float32)
    b = x.shape[0]

    def eps_from(out, xc, c):
        if eps_fn is not None:
            return eps_fn(out, xc, c)
        return diffuser.predict(out, xc, c)["pred_eps"]

    # anchor (call 0): always full — establishes the cache
    c0 = row0(anchor)
    out0, cache = full_fn(x, jnp.full((b,), c0["t"], jnp.int32))
    eps = eps_from(out0, x, c0)
    x, _ = diffuser._jump_with_eps(eps, x, c0)

    n_pairs = 0 if sp_t is None else len(sp_t["t"])
    if n_pairs:
        # call index of pair k is k+1; refresh the cache every interval-th
        is_full = (jnp.arange(1, n_pairs + 1) % interval) == 0

        def body(carry, row):
            xc, eps_buf, u = carry
            cs, cm, cf, refresh = row
            x_sb, _ = diffuser._jump_with_eps(eps_buf, xc, cs)
            t_mid = jnp.full((b,), cm["t"], jnp.int32)

            def full(xs, u):
                return full_fn(xs, t_mid)

            def shallow(xs, u):
                return shallow_fn(xs, t_mid, u), u

            out, u = jax.lax.cond(refresh, full, shallow, x_sb, u)
            eps_new = eps_from(out, x_sb, cm)
            x_next, _ = diffuser._jump_with_eps(eps_new, xc, cf)
            return (x_next, eps_new, u), None

        (x, eps, cache), _ = jax.lax.scan(
            body, (x, eps, cache), (dev(sp_t), dev(mid_t), dev(fl_t), is_full))

    if trail is not None:
        ct = row0(trail)
        t_tr = jnp.full((b,), ct["t"], jnp.int32)
        if (n_pairs + 1) % interval == 0:  # static call index
            out_tr, cache = full_fn(x, t_tr)
        else:
            out_tr = shallow_fn(x, t_tr, cache)
        x, _ = diffuser._jump_with_eps(eps_from(out_tr, x, ct), x, ct)
    return x
