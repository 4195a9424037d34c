"""dmtpu — a TPU-native diffusion-models research framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
xyfJASON/diffusion-models-pytorch (mounted read-only at /root/reference):
sampler family (DDPM / DDIM / DDPM-IP / Euler / Heun) as jitted lax.scan
loops, composable in-graph guidance (CFG / CLIP / mask+RePaint / ILVR /
SDEdit / DDIB), a Flax model zoo, data-parallel pjit training with on-device
EMA, and checkpoint conversion from the reference's PyTorch weights.
"""

__version__ = "0.1.0"
