"""TPU compute ops: attention (flash + XLA), fused normalisation kernels."""
from dmtpu.ops.attention import flash_mha, mha

__all__ = ["mha", "flash_mha"]
