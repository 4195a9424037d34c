"""Image saving helpers (PIL-based; torchvision-free).

Replaces the reference's ``torchvision.utils.save_image`` usage in the
training/sampling scripts.  Arrays are NHWC float in [-1, 1].
"""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
from PIL import Image

from dmtpu.utils.misc import image_norm_to_uint8


def to_pil(image: np.ndarray) -> Image.Image:
    """One [-1,1] float NHWC/HWC image -> PIL."""
    arr = np.asarray(image)
    if arr.ndim == 4:
        arr = arr[0]
    u8 = image_norm_to_uint8(arr)
    if u8.shape[-1] == 1:
        u8 = u8[..., 0]
    return Image.fromarray(u8)


def save_image(image: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    to_pil(image).save(path)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """[N,H,W,C] in [-1,1] -> one [-1,1] grid image (white padding)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nr = math.ceil(n / ncol)
    grid = np.ones((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    save_image(make_grid(images, nrow=nrow), path)
