"""Checkpoint conversion: upstream PyTorch weights → Flax param trees."""
from dmtpu.convert.common import (
    convert_by_structure,
    load_torch_weights,
)
from dmtpu.convert.zoo import convert_mmdit

__all__ = ["convert_by_structure", "convert_mmdit", "load_torch_weights"]
