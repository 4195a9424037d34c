"""FID InceptionV3 in Flax (pt_inception-2015-12-05 layout), NHWC.

The reference evaluates FID/IS with torch-fidelity (reference: docs/DDPM.md
"Evaluation"), whose feature network is the TF-ported InceptionV3 used by
pytorch-fid: torchvision's InceptionV3 graph with the FID-specific block
variants (branch avg-pools exclude padding; ``Mixed_7c``'s pool branch is a
max-pool) and a 1008-way logits head.  This module re-implements that graph
in Flax with torch-matching submodule names (``.`` → ``__``) so the official
``pt_inception-2015-12-05-52768-1.pth`` converts mechanically via
``convert_inception_checkpoint`` (the image is zero-egress: supply the file
locally, everything else is ready).

Outputs: ``pool3`` features [N, 2048] (FID) and logits [N, 1008] (IS).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BasicConv2d(nn.Module):
    """conv(bias=False) + BatchNorm(eps=1e-3, frozen stats) + relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool_nopad(x: Array) -> Array:
    """3×3 stride-1 avg pool, pad 1, count_include_pad=False (the FID variants'
    departure from stock torchvision)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool(x: Array, stride: int = 2, pad: int = 0) -> Array:
    return nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg_pool_nopad(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_nopad(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7b: FID avg (no pad count); Mixed_7c: max

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        pooled = _avg_pool_nopad(x) if self.pool == "avg" else _max_pool(x, stride=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Full FID Inception graph.  Input: float in [0, 1], NHWC, any H×W
    (resized to 299² in-graph when ``resize_input``); returns
    (pool3 [N, 2048], logits [N, 1008])."""

    resize_input: bool = True
    normalize_input: bool = True  # [0,1] → [-1,1] (TF convention)

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        pool3 = x.mean(axis=(1, 2))  # adaptive avg pool to 1×1
        logits = nn.Dense(1008, name="fc")(pool3)
        return pool3, logits


def convert_inception_checkpoint(state_dict: Dict[str, Any]) -> Dict:
    """torch pt_inception state_dict (numpy values) → flax variables.

    Mapping per tensor:
      ``*.conv.weight`` [O,I,kH,kW] → ``params/*/conv/kernel`` [kH,kW,I,O]
      ``*.bn.{weight,bias}``        → ``params/*/bn/{scale,bias}``
      ``*.bn.running_{mean,var}``   → ``batch_stats/*/bn/{mean,var}``
      ``fc.{weight,bias}``          → ``params/fc/{kernel,bias}`` (kernel.T)
    """
    import numpy as np

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if key == "fc.weight":
            put(params, ("fc", "kernel"), v.T)
        elif key == "fc.bias":
            put(params, ("fc", "bias"), v)
        elif parts[-2] == "conv" and parts[-1] == "weight":
            put(params, tuple(parts[:-1]) + ("kernel",), v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            which = parts[-1]
            if which == "weight":
                put(params, tuple(parts[:-1]) + ("scale",), v)
            elif which == "bias":
                put(params, tuple(parts[:-1]) + ("bias",), v)
            elif which == "running_mean":
                put(stats, tuple(parts[:-1]) + ("mean",), v)
            elif which == "running_var":
                put(stats, tuple(parts[:-1]) + ("var",), v)
            else:
                raise ValueError(f"unexpected bn key {key}")
        else:
            raise ValueError(f"unexpected inception key {key}")
    return {"params": params, "batch_stats": stats}


class InceptionFeatureExtractor:
    """Drop-in extractor for ``dmtpu.eval.fid`` — classic Inception-FID.

    ``weights_path``: local pt_inception-2015-12-05 .pth (torch format).
    ``__call__(images_u8)`` → pool3 features [N, 2048] (for FID);
    ``classify(images_u8)`` → class probabilities [N, 1008] (for IS).
    """

    def __init__(self, weights_path: str, batch_size: int = 128):
        import numpy as np

        from dmtpu.convert.common import load_torch_weights

        self.module = FIDInceptionV3()
        self.variables = convert_inception_checkpoint(load_torch_weights(weights_path))
        self.batch_size = batch_size

        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            pool3, logits = self.module.apply(variables, x)
            return pool3, jax.nn.softmax(logits, axis=-1)

        self._run = jax.jit(run)
        self._np = np

    def _batched(self, images_u8):
        np = self._np
        # cache the last sweep by input identity: __call__ followed by
        # classify on the same array (the natural FID-then-IS pattern) must
        # not run the network twice.  A WEAK reference is held: identity
        # comparison stays safe against id-reuse (the weakref dies with the
        # array, so a dead entry can never match a new object) without
        # pinning a multi-GB image set in host RAM after the caller drops it.
        import weakref

        cached_ref, cached = getattr(self, "_sweep_cache", (None, None))
        if cached_ref is not None and cached_ref() is images_u8:
            return cached
        feats, probs = [], []
        for i in range(0, len(images_u8), self.batch_size):
            batch = jnp.asarray(np.asarray(images_u8[i:i + self.batch_size]))
            f, p = self._run(self.variables, batch)
            feats.append(np.asarray(f))
            probs.append(np.asarray(p))
        out = (np.concatenate(feats), np.concatenate(probs))
        try:
            self._sweep_cache = (weakref.ref(images_u8), out)
        except TypeError:  # object without weakref support (e.g. a list)
            self._sweep_cache = (lambda a=images_u8: a, out)
        return out

    def features_and_probs(self, images_u8):
        """One network sweep → (pool3 [N,2048], class probs [N,1008]).
        FID+IS evaluations should use this instead of two separate sweeps."""
        return self._batched(images_u8)

    def __call__(self, images_u8):
        return self._batched(images_u8)[0]

    def classify(self, images_u8):
        return self._batched(images_u8)[1]
