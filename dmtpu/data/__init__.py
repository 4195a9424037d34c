"""Data layer: datasets, transforms, loader."""
from dmtpu.data.datasets import (
    CIFAR10,
    CelebAHQ,
    ImageDir,
    ImageNet,
    MNIST,
    Synthetic,
    extract_images,
)
from dmtpu.data.loader import DataLoader

__all__ = [
    "ImageDir", "MNIST", "CIFAR10", "CelebAHQ", "ImageNet", "Synthetic",
    "DataLoader", "extract_images",
]
