"""Alias module so reference `datasets.celebahq.CelebAHQ` targets resolve."""
from dmtpu.data.datasets import CelebAHQ

__all__ = ["CelebAHQ"]
