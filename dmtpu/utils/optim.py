"""Optax optimizer factories keyed by the reference's torch.optim targets.

The reference instantiates ``torch.optim.Adam(params, lr=...)`` from config
(reference: configs/ddpm_cifar10.yaml ``train.optim``); these factories
return the equivalent ``optax.GradientTransformation`` with torch-default
hyperparameters (betas=(0.9, 0.999), eps=1e-8).
"""
from __future__ import annotations

import optax


def _resolve_lr(lr):
    """float, or a ``{target:, params:}`` schedule config (any optax schedule,
    e.g. ``optax.cosine_decay_schedule``) → value usable as the optax lr."""
    if hasattr(lr, "keys") and "target" in lr:
        from dmtpu.utils.config import instantiate_from_config

        return instantiate_from_config(lr)
    return float(lr)


def lr_fn(optim_conf):
    """step -> actual learning rate, for logging.  Mirrors ``_resolve_lr`` so
    logged LR always tracks what the optimizer applies (schedules included).
    Unknown layouts (e.g. a raw optax target with its own param names) log
    NaN rather than a plausible-looking wrong constant."""
    params = dict(optim_conf.get("params", {}))
    lr = params.get("lr", params.get("learning_rate"))
    if lr is None:
        # the repo's own factories (and their torch.optim registry aliases)
        # apply a documented default lr=1e-3 when the key is omitted —
        # except adafactor, whose lr-less form has no fixed step size
        target = str(optim_conf.get("target", ""))
        if "adafactor" in target.lower():
            return lambda step: float("nan")
        if any(t in target for t in ("torch.optim.", "utils.optim.")):
            return lambda step: 1e-3
        return lambda step: float("nan")
    lr = _resolve_lr(lr)
    if callable(lr):
        return lambda step: float(lr(step))
    return lambda step: float(lr)


def _dtype(d):
    if d is None or not isinstance(d, str):
        return d
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "f32": jnp.float32}[d]


def adam(lr=1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0,
         mu_dtype=None):
    """``mu_dtype='bfloat16'`` stores the first moment in bf16 — halves that
    slice of optimizer HBM (the second moment stays f32: its eps-sensitive
    small values need the mantissa)."""
    lr = _resolve_lr(lr)
    mu_dtype = _dtype(mu_dtype)
    if weight_decay:
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, mu_dtype=mu_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps, mu_dtype=mu_dtype)


def adamw(lr=1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01,
          mu_dtype=None):
    return optax.adamw(_resolve_lr(lr), b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay, mu_dtype=_dtype(mu_dtype))


def adafactor(lr=None, min_dim_size_to_factor: int = 128, decay_rate: float = 0.8,
              momentum=None, momentum_dtype="bfloat16", clipping_threshold=1.0,
              multiply_by_parameter_scale: bool = False, weight_decay: float = 0.0,
              eps: float = 1e-30):
    """Memory-efficient optimizer (Shazeer & Stern, arXiv:1804.04235).

    The single-chip route through the SD-scale training memory wall
    (docs/ROADMAP.md): f32 Adam moments for the 859M-param SD1.5 UNet are
    6.9 GB of a 16 GB v5e HBM; adafactor's factored second moment stores
    per-row + per-column statistics instead (~KBs per weight matrix), and
    its optional momentum defaults to bf16 here.  With ``momentum=None``
    (the default) total optimizer state is negligible.

    Defaults diverge from optax deliberately: ``multiply_by_parameter_scale``
    is off so a config's explicit ``lr`` behaves like a standard step size
    (diffusion fine-tuning convention), and ``lr`` may be a float or a
    ``{target:, params:}`` schedule like the other factories here.
    """
    lr = _resolve_lr(lr) if lr is not None else None
    # weight decay uses optax.adafactor's native DECOUPLED weight_decay_rate
    # (AdamW-style, like the sibling adamw factory) — chaining
    # add_decayed_weights BEFORE adafactor would feed the decay term into
    # the factored second-moment statistics and the update clipping,
    # distorting both.
    return optax.adafactor(
        learning_rate=lr,
        min_dim_size_to_factor=min_dim_size_to_factor,
        decay_rate=decay_rate,
        momentum=momentum,
        dtype_momentum=_dtype(momentum_dtype) or "bfloat16",
        clipping_threshold=clipping_threshold,
        multiply_by_parameter_scale=multiply_by_parameter_scale,
        weight_decay_rate=weight_decay or None,
        eps=eps,
    )


def sgd(lr, momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False):
    tx = optax.sgd(_resolve_lr(lr), momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
