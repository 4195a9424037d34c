"""Alias module so reference `datasets.imagenet.ImageNet` targets resolve."""
from dmtpu.data.datasets import ImageNet

__all__ = ["ImageNet"]
