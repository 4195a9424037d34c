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
        # apply a documented default lr=1e-3 when the key is omitted
        target = str(optim_conf.get("target", ""))
        if any(t in target for t in ("torch.optim.", "utils.optim.")):
            return lambda step: 1e-3
        return lambda step: float("nan")
    lr = _resolve_lr(lr)
    if callable(lr):
        return lambda step: float(lr(step))
    return lambda step: float(lr)


def adam(lr=1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0):
    lr = _resolve_lr(lr)
    if weight_decay:
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def adamw(lr=1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01):
    return optax.adamw(_resolve_lr(lr), b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def sgd(lr, momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False):
    tx = optax.sgd(_resolve_lr(lr), momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
