"""Data layer: raw-format parsers, loader semantics, mask generator."""
import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from dmtpu.data import CIFAR10, MNIST, DataLoader, ImageDir, Synthetic
from dmtpu.utils.mask import DatasetWithMask, MaskGenerator


@pytest.fixture
def mnist_root(tmp_path):
    """Synthesise idx-format MNIST files (torchvision raw layout)."""
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (10, 28, 28), dtype=np.uint8)
    labels = rs.randint(0, 10, (10,), dtype=np.uint8)
    with open(raw / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 0x803, 10, 28, 28))
        f.write(imgs.tobytes())
    # labels gzipped (exercise the .gz path)
    with gzip.open(raw / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 0x801, 10) + labels.tobytes())
    with gzip.open(raw / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 0x803, 10, 28, 28) + imgs.tobytes())
    with open(raw / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 0x801, 10) + labels.tobytes())
    return str(tmp_path), imgs, labels


def test_mnist_parser(mnist_root):
    root, imgs, labels = mnist_root
    ds = MNIST(root, img_size=28, split="train")
    assert len(ds) == 10
    x, y = ds[3]
    assert x.shape == (28, 28, 1) and x.dtype == np.float32
    np.testing.assert_allclose(x[..., 0], imgs[3] / 255.0 * 2 - 1, atol=1e-6)
    assert y == int(labels[3])
    # gz split
    ds2 = MNIST(root, img_size=28, split="test")
    assert len(ds2) == 10


def test_cifar10_parser(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rs = np.random.RandomState(1)
    for name, n in [("data_batch_1", 20), ("test_batch", 8)]:
        data = rs.randint(0, 256, (n, 3072), dtype=np.uint8)
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rs.randint(0, 10, n))}, f)
    for i in range(2, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": np.zeros((1, 3072), np.uint8), b"labels": [0]}, f)
    ds = CIFAR10(str(tmp_path), img_size=32, split="train", transform_type="none")
    assert len(ds) == 24
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and -1 <= x.min() and x.max() <= 1
    ds_test = CIFAR10(str(tmp_path), img_size=32, split="test")
    assert len(ds_test) == 8


def test_image_dir(tmp_path):
    from PIL import Image

    for i in range(3):
        Image.fromarray(np.full((16, 16, 3), i * 40, np.uint8)).save(tmp_path / f"{i}.png")
    ds = ImageDir(str(tmp_path), img_size=8)
    assert len(ds) == 3
    assert ds[0].shape == (8, 8, 3)
    with pytest.raises(ValueError):
        ImageDir(str(tmp_path / "nope"))


def test_loader_determinism_and_shapes():
    ds = Synthetic(img_size=8, n=40, num_classes=4, seed=0)
    dl1 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=0)
    dl2 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=2)
    b1 = next(iter(dl1))
    b2 = next(iter(dl2))
    np.testing.assert_array_equal(b1[0], b2[0])  # same seed -> same order
    assert b1[0].shape == (8, 8, 8, 3) and b1[1].shape == (8,)
    assert len(dl1) == 5
    # epochs reshuffle
    b1b = next(iter(dl1))
    assert not np.array_equal(b1[0], b1b[0])


def test_loader_host_striping():
    ds = Synthetic(img_size=4, n=32, seed=0)
    a = DataLoader(ds, batch_size=4, shuffle=False, num_shards=2, shard_index=0, num_workers=0)
    b = DataLoader(ds, batch_size=4, shuffle=False, num_shards=2, shard_index=1, num_workers=0)
    xa = np.concatenate([x for x in a])
    xb = np.concatenate([x for x in b])
    assert len(xa) == len(xb) == 16
    assert not np.array_equal(xa[0], xb[0])


@pytest.mark.parametrize("mtype", ["center", "rect", "brush", "half", "every-second-line", "sr2x"])
def test_mask_generator_families(mtype):
    gen = MaskGenerator(mask_type=mtype, is_train=False)
    m = gen.sample(32, 32, item=5)
    assert m.shape == (32, 32, 1) and m.dtype == np.float32
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert 0 < m.mean() < 1 or mtype in ("center",)  # something masked
    # eval determinism: same item -> same mask
    np.testing.assert_array_equal(m, gen.sample(32, 32, item=5))
    if mtype in ("rect", "brush"):
        assert not np.array_equal(m, gen.sample(32, 32, item=6))


def test_dataset_with_mask():
    ds = DatasetWithMask(Synthetic(img_size=16, n=4, seed=0), mask_type="center")
    img, mask = ds[0]
    assert img.shape == (16, 16, 3) and mask.shape == (16, 16, 1)


def test_loader_producer_exception_surfaces():
    """Regression: a dataset error inside the producer thread must raise in
    the consumer, not leave it blocked on the queue forever."""

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt item")
            return np.zeros((4, 4, 3), np.float32)

    dl = DataLoader(Bad(), batch_size=4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt item"):
        for _ in dl:
            pass


def test_loader_shards_get_equal_batch_counts():
    """Regression: uneven stripes deadlock multi-host lockstep training;
    shards must pad by wrap-around to the same batch count
    (torch DistributedSampler semantics)."""
    ds = Synthetic(img_size=4, n=9, seed=0)
    shards = [DataLoader(ds, batch_size=5, shuffle=False, num_shards=2,
                         shard_index=i, num_workers=0) for i in (0, 1)]
    counts = [sum(1 for _ in s) for s in shards]
    assert counts[0] == counts[1] == 1
    assert all(len(s) == c for s, c in zip(shards, counts))


def test_celebahq_mapping_file_and_empty_split(tmp_path):
    from PIL import Image

    from dmtpu.data import CelebAHQ

    img_root = tmp_path / "CelebA-HQ-img"
    img_root.mkdir()
    for i in range(4):  # raw CelebAMask-HQ numbering 0..3
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_root / f"{i}.jpg")
    # official mapping: HQ idx -> original CelebA filename
    origs = ["000010.jpg", "162800.jpg", "182700.jpg", "202599.jpg"]
    lines = ["idx orig_idx orig_file"] + [f"{i} {i} {o}" for i, o in enumerate(origs)]
    (tmp_path / "CelebA-HQ-to-CelebA-mapping.txt").write_text("\n".join(lines))

    assert len(CelebAHQ(str(tmp_path), img_size=8, split="train")) == 1   # 10
    assert len(CelebAHQ(str(tmp_path), img_size=8, split="valid")) == 1   # 162800
    assert len(CelebAHQ(str(tmp_path), img_size=8, split="test")) == 2    # 182700, 202599
    assert len(CelebAHQ(str(tmp_path), img_size=8, split="all")) == 4

    # without the mapping file, raw 0..3 numbering matches no split -> loud
    (tmp_path / "CelebA-HQ-to-CelebA-mapping.txt").unlink()
    with pytest.raises(ValueError, match="mapping"):
        CelebAHQ(str(tmp_path), img_size=8, split="test")
