"""Checkpoint conversion: upstream PyTorch weights → Flax param trees."""
from dmtpu.convert.common import (
    convert_by_structure,
    load_torch_weights,
)

__all__ = ["convert_by_structure", "load_torch_weights"]
