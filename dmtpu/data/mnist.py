"""Alias module so reference `datasets.mnist.MNIST` targets resolve."""
from dmtpu.data.datasets import MNIST

__all__ = ["MNIST"]
