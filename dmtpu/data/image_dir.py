"""Alias module so reference `datasets.ImageDir.ImageDir` targets resolve."""
from dmtpu.data.datasets import ImageDir, extract_images

__all__ = ["ImageDir", "extract_images"]
