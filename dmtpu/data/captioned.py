"""Captioned image datasets for latent text-to-image fine-tuning.

Beyond reference parity (the reference trains pixel-space DDPMs only —
reference: scripts/train_ddpm.py); these feed ``scripts/train_sd.py``.

Items are ``{"image": float32 HWC in [-1, 1], "caption": str}`` — the
loader's dict collation stacks images and gathers captions into an object
array; tokenisation happens per batch on the host (the ids are what enter
the compiled step).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dmtpu.data.datasets import extract_images
from dmtpu.data.transforms import ImageTransform


class CaptionedImageDir:
    """Directory of images with sidecar caption files (the standard
    diffusers/kohya fine-tuning layout): ``img.png`` + ``img.txt``.

    Images without a sidecar get ``default_caption``.
    """

    def __init__(self, root: str, img_size: int, caption_ext: str = ".txt",
                 default_caption: str = "", flip_p: float = 0.5,
                 transform=None, **_):
        root = os.path.expanduser(root)
        if not os.path.isdir(root):
            raise ValueError(f"{root} is not a valid directory")
        self.img_paths = extract_images(root)
        if not self.img_paths:
            raise ValueError(f"no images under {root}")
        self.caption_ext = caption_ext
        self.default_caption = default_caption
        self.transform = transform or ImageTransform(img_size, flip_p=flip_p)

    def __len__(self):
        return len(self.img_paths)

    def _caption(self, img_path: str) -> str:
        side = os.path.splitext(img_path)[0] + self.caption_ext
        if os.path.isfile(side):
            with open(side, encoding="utf-8") as f:
                return f.read().strip()
        return self.default_caption

    def __getitem__(self, i: int):
        from PIL import Image

        img = Image.open(self.img_paths[i]).convert("RGB")
        return {"image": self.transform(img), "caption": self._caption(self.img_paths[i])}


class SyntheticEmbedded:
    """Deterministic images + PRECOMPUTED text-embedding pytrees — the
    cached-embedding text-to-image workflow (embed the captions once, train
    MMDiT/SD on ``{"image", "context", "pooled"}`` with no text tower in the
    step).  Items collate into the flat dict the train step shards.

    Images and embeddings are correlated per pseudo-class (index % n_classes)
    so conditioning is actually learnable in smoke tests.
    """

    def __init__(self, img_size: int = 32, channels: int = 3, n: int = 256,
                 context_len: int = 8, context_dim: int = 64,
                 pooled_dim: int = 32, n_classes: int = 4, seed: int = 0, **_):
        rng = np.random.RandomState(seed)
        cls = np.arange(n) % n_classes
        base = rng.uniform(-1, 1, (n_classes, img_size, img_size, channels))
        noise = 0.1 * rng.randn(n, img_size, img_size, channels)
        self.images = np.clip(base[cls] + noise, -1, 1).astype(np.float32)
        ctx_table = rng.randn(n_classes, context_len, context_dim)
        pool_table = rng.randn(n_classes, pooled_dim)
        self.contexts = ctx_table[cls].astype(np.float32)
        self.pooled = pool_table[cls].astype(np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int):
        return {"image": self.images[i], "context": self.contexts[i],
                "pooled": self.pooled[i]}


class SyntheticCaptioned:
    """Deterministic random images + template captions (tests/benchmarks —
    no disk IO, no egress)."""

    _TEMPLATES = ("a photo of object {}", "a drawing of thing {}",
                  "an image number {}", "")

    def __init__(self, img_size: int = 64, channels: int = 3, n: int = 256,
                 seed: int = 0, **_):
        rng = np.random.RandomState(seed)
        self.images = rng.uniform(-1, 1, (n, img_size, img_size, channels)).astype(np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int):
        return {"image": self.images[i],
                "caption": self._TEMPLATES[i % len(self._TEMPLATES)].format(i)}
