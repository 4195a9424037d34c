"""Dataset classes (torchvision-free parsers + directory datasets).

Each dataset returns per-item either a float32 HWC [-1,1] image, or an
(image, label) pair.  Parity targets:
  - ImageDir   (reference: datasets/ImageDir.py:20-35)
  - MNIST      (reference: datasets/mnist.py:8-60)   — raw idx-file parser
  - CIFAR10    (reference: datasets/cifar10.py:8-63) — python-pickle batches
  - CelebAHQ   (reference: datasets/celebahq.py:22-111, official CelebA split)
  - ImageNet   (reference: datasets/imagenet.py:22-106)
All normalise to [-1, 1]; train splits randomly h-flip.
"""
from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from dmtpu.data.transforms import ImageTransform, to_norm_array, pil_resize

IMG_EXT = (".jpg", ".jpeg", ".png", ".bmp", ".tiff")


def extract_images(root: str) -> List[str]:
    """Recursively collect image paths, sorted.  (reference: datasets/ImageDir.py:7-17)"""
    root = os.path.expanduser(root)
    paths = []
    for curdir, _, files in os.walk(root):
        for f in files:
            if os.path.splitext(f)[1].lower() in IMG_EXT:
                paths.append(os.path.join(curdir, f))
    return sorted(paths)


class ImageDir:
    """(reference: datasets/ImageDir.py:20-35)

    ``cache=True`` keeps decoded PIL images in memory — with small datasets
    the per-step host decode otherwise dominates TPU step time.
    """

    def __init__(self, root: str, img_size: Optional[int] = None, transform=None,
                 flip_p: float = 0.0, cache: bool = False):
        root = os.path.expanduser(root)
        if not os.path.isdir(root):
            raise ValueError(f"{root} is not a valid directory")
        self.img_paths = extract_images(root)
        self.transform = transform
        if transform is None and img_size is not None:
            self.transform = ImageTransform(img_size, flip_p=flip_p)
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self):
        return len(self.img_paths)

    def _load(self, item: int) -> Image.Image:
        if self._cache is not None:
            if item not in self._cache:
                self._cache[item] = Image.open(self.img_paths[item]).convert("RGB")
            return self._cache[item]
        return Image.open(self.img_paths[item]).convert("RGB")

    def __getitem__(self, item: int):
        img = self._load(item)
        if self.transform is not None:
            return self.transform(img)
        return to_norm_array(img)


class MNIST:
    """Raw idx-format parser (torchvision's MNIST/raw layout, .gz or plain)."""

    _FILES = {
        "train": ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
        "test": ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
    }

    def __init__(self, root: str, img_size: int = 28, split: str = "train", **_):
        if split not in ("train", "test"):
            raise ValueError(f"Invalid split: {split}")
        self.img_size = img_size
        img_f, lbl_f = self._FILES[split]
        base = os.path.expanduser(root)
        raw = os.path.join(base, "MNIST", "raw")
        if not os.path.isdir(raw):
            raw = base
        self.images = self._read_idx(os.path.join(raw, img_f))
        self.labels = self._read_idx(os.path.join(raw, lbl_f))

    @staticmethod
    def _read_idx(path: str) -> np.ndarray:
        opener = open
        if not os.path.exists(path) and os.path.exists(path + ".gz"):
            path, opener = path + ".gz", gzip.open
        with opener(path, "rb") as f:
            magic = struct.unpack(">I", f.read(4))[0]
            ndim = magic & 0xFF
            dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
            data = np.frombuffer(f.read(), dtype=np.uint8)
        return data.reshape(dims)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, item: int) -> Tuple[np.ndarray, int]:
        img = Image.fromarray(self.images[item])
        if self.img_size != 28:
            img = pil_resize(img, self.img_size)
        arr = to_norm_array(img)
        return arr, int(self.labels[item])


class CIFAR10:
    """cifar-10-batches-py pickle parser."""

    def __init__(self, root: str, img_size: int = 32, split: str = "train",
                 transform_type: str = "default", **_):
        if split not in ("train", "test"):
            raise ValueError(f"Invalid split: {split}")
        self.img_size = img_size
        self.split = split
        self.flip_p = 0.5 if (split == "train" and transform_type != "none") else 0.0
        base = os.path.join(os.path.expanduser(root), "cifar-10-batches-py")
        if not os.path.isdir(base):
            base = os.path.expanduser(root)
        names = [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
        xs, ys = [], []
        for n in names:
            with open(os.path.join(base, n), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        self.images = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = np.asarray(ys, np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, item: int, rng: Optional[np.random.RandomState] = None) -> Tuple[np.ndarray, int]:
        arr = self.images[item]
        if self.img_size != 32:
            arr = np.asarray(pil_resize(Image.fromarray(arr), self.img_size))
        arr = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        r = rng or np.random
        if self.flip_p > 0 and r.rand() < self.flip_p:
            arr = arr[:, ::-1].copy()
        return arr, int(self.labels[item])


class CelebAHQ:
    """(reference: datasets/celebahq.py:22-111; official CelebA split boundaries)"""

    _SPLITS = [1, 162771, 182638, 202600]

    def __init__(self, root: str, img_size: int, split: str = "train",
                 transform_type: str = "default", transform=None, **_):
        if split not in ("train", "valid", "test", "all"):
            raise ValueError(f"Invalid split: {split}")
        root = os.path.expanduser(root)
        image_root = os.path.join(root, "CelebA-HQ-img")
        if not os.path.isdir(image_root):
            raise ValueError(f"{image_root} is not an existing directory")
        paths = extract_images(image_root)
        if split != "all":
            k = {"train": 0, "valid": 1, "test": 2}[split]
            lo, hi = self._SPLITS[k], self._SPLITS[k + 1]
            # The split boundaries are original-CelebA image numbers.  Raw
            # CelebAMask-HQ filenames run 0..29999 instead; when the official
            # mapping file is present, translate through it so that layout
            # works too (the reference requires pre-renamed files).
            idx_to_orig = {}
            mapping_file = os.path.join(root, "CelebA-HQ-to-CelebA-mapping.txt")
            if os.path.isfile(mapping_file):
                with open(mapping_file) as f:
                    next(f, None)  # header
                    for line in f:
                        parts = line.split()
                        if len(parts) >= 3:
                            idx_to_orig[int(parts[0])] = int(
                                os.path.splitext(parts[2])[0])

            def number_of(p):
                name = os.path.splitext(os.path.basename(p))[0]
                try:
                    return int(name)
                except ValueError:
                    raise ValueError(
                        f"CelebAHQ expects numeric filenames, got {name!r} "
                        "(original-CelebA numbers, or CelebAMask-HQ indices "
                        "with CelebA-HQ-to-CelebA-mapping.txt present)")

            nums = [number_of(p) for p in paths]
            # Only translate when the filenames actually look like raw
            # CelebAMask-HQ indices (all in 0..29999).  A pre-renamed
            # original-CelebA layout that also carries the mapping file has
            # numbers up to 202599 — translating its <30000 subset would
            # silently scramble the splits.
            use_mapping = bool(idx_to_orig) and nums and max(nums) < 30000
            if not use_mapping:
                idx_to_orig = {}
            paths = [p for p, n in zip(paths, nums)
                     if lo <= idx_to_orig.get(n, n) < hi]
            if not paths:
                raise ValueError(
                    f"CelebAHQ split {split!r} matched 0 of the files under "
                    f"{image_root}: filenames must carry original-CelebA "
                    "numbers, or place CelebA-HQ-to-CelebA-mapping.txt "
                    "beside CelebA-HQ-img/ for raw CelebAMask-HQ numbering")
        self.img_paths = paths
        flip_p = 0.5 if (split in ("train", "all") and transform_type != "none") else 0.0
        self.transform = transform or ImageTransform(img_size, flip_p=flip_p)

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, item: int):
        return self.transform(Image.open(self.img_paths[item]).convert("RGB"))


class ImageNet:
    """(reference: datasets/imagenet.py:22-106)"""

    def __init__(self, root: str, img_size: int, split: str = "train",
                 transform_type: str = "default", transform=None, **_):
        if split not in ("train", "valid", "test"):
            raise ValueError(f"Invalid split: {split}")
        root = os.path.expanduser(root)
        image_root = os.path.join(root, split)
        if split == "valid" and not os.path.isdir(image_root):
            image_root = os.path.join(root, "val")
        if not os.path.isdir(image_root):
            raise ValueError(f"{image_root} is not an existing directory")
        self.img_paths = extract_images(image_root)
        flip_p = 0.5 if (split == "train" and transform_type != "none") else 0.0
        if transform is not None:
            self.transform = transform
        elif transform_type in ("default", "resize-crop"):
            crop = "random" if split == "train" else "center"
            self.transform = ImageTransform(img_size, flip_p=flip_p, crop=crop)
        elif transform_type == "resize":
            self.transform = ImageTransform(img_size, flip_p=flip_p)
        elif transform_type == "none":
            self.transform = None
        else:
            raise ValueError(f"Invalid transform_type: {transform_type}")

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, item: int):
        img = Image.open(self.img_paths[item]).convert("RGB")
        if self.transform is not None:
            return self.transform(img)
        return to_norm_array(img)


class Synthetic:
    """Deterministic random-image dataset for tests/benchmarks (no disk IO)."""

    def __init__(self, img_size: int = 32, channels: int = 3, n: int = 1024,
                 num_classes: Optional[int] = None, seed: int = 0, **_):
        rng = np.random.RandomState(seed)
        self.images = rng.uniform(-1, 1, (n, img_size, img_size, channels)).astype(np.float32)
        self.labels = rng.randint(0, num_classes, (n,)) if num_classes else None

    def __len__(self):
        return len(self.images)

    def __getitem__(self, item: int):
        if self.labels is not None:
            return self.images[item], int(self.labels[item])
        return self.images[item]
