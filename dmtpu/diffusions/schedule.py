"""Noise schedules and timestep respacing.

TPU-native design: all schedule tables are computed **on the host in float64
NumPy** and only materialised on device (as float32 constants baked into the
jitted sampler) after all sensitive arithmetic (cumprod, reciprocals, logs) is
done in double precision.  This mirrors the reference's float64 beta tables
(reference: diffusions/schedule.py:24) without ever enabling jax_x64.

Parity surface (reference: diffusions/schedule.py):
  - get_beta_schedule: 'linear' | 'quad' | 'const' | 'cosine'   (:5-38)
  - get_respaced_seq: 'uniform'/'uniform-leading' | 'uniform-linspace' |
        'uniform-trailing' | 'quad' | 'none'/None                (:41-73)
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["get_beta_schedule", "get_respaced_seq"]


def get_beta_schedule(
    total_steps: int = 1000,
    beta_schedule: str = "linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Return a float64 numpy array of betas of length ``total_steps``."""
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, total_steps, dtype=np.float64)
    elif beta_schedule == "quad":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5, total_steps, dtype=np.float64) ** 2
    elif beta_schedule == "const":
        return np.full((total_steps,), beta_end, dtype=np.float64)
    elif beta_schedule == "cosine":
        def alpha_bar(t: float) -> float:
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1.0 - alpha_bar((i + 1) / total_steps) / alpha_bar(i / total_steps), 0.999)
            for i in range(total_steps)
        ]
        return np.asarray(betas, dtype=np.float64)
    else:
        raise ValueError(f"Beta schedule {beta_schedule} is not supported.")


def get_respaced_seq(
    total_steps: int = 1000,
    respace_type: str | None = "uniform",
    respace_steps: int = 100,
) -> np.ndarray:
    """Return an int64 numpy array of preserved timestep indices (ascending)."""
    if respace_type in ("uniform", "uniform-leading"):
        space = total_steps // respace_steps
        seq = np.arange(0, total_steps, space, dtype=np.int64)
    elif respace_type == "uniform-linspace":
        seq = np.linspace(0, total_steps - 1, respace_steps).astype(np.int64)
    elif respace_type == "uniform-trailing":
        space = total_steps // respace_steps
        seq = np.arange(total_steps - 1, -1, -space, dtype=np.int64)[::-1].copy()
    elif respace_type == "quad":
        seq = np.linspace(0, math.sqrt(total_steps * 0.8), respace_steps) ** 2
        seq = np.floor(seq).astype(np.int64)
    elif respace_type is None or respace_type == "none":
        seq = np.arange(0, total_steps, dtype=np.int64)
    else:
        raise ValueError(f"Respace type {respace_type} is not supported.")
    return seq
