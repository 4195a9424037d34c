"""Optax optimizer factories keyed by the reference's torch.optim targets.

The reference instantiates ``torch.optim.Adam(params, lr=...)`` from config
(reference: configs/ddpm_cifar10.yaml ``train.optim``); these factories
return the equivalent ``optax.GradientTransformation`` with torch-default
hyperparameters (betas=(0.9, 0.999), eps=1e-8).
"""
from __future__ import annotations

import optax


def adam(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0):
    if weight_decay:
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-lr),
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def adamw(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
