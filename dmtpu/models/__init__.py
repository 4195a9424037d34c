"""Flax model zoo.  (public surface parity: reference models/__init__.py:1-3)"""
from dmtpu.models.ema import EMAState
from dmtpu.models.lora import apply_lora, init_lora, merge_lora
from dmtpu.models.unet import UNet
from dmtpu.models.unet_categorial_adagn import UNetCategorialAdaGN

__all__ = ["UNet", "UNetCategorialAdaGN", "EMAState",
           "init_lora", "apply_lora", "merge_lora"]
