"""Alias module so reference `datasets.cifar10.CIFAR10` targets resolve."""
from dmtpu.data.datasets import CIFAR10

__all__ = ["CIFAR10"]
