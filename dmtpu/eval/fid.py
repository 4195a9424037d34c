"""FID evaluation harness.

The reference computes FID/IS externally with torch-fidelity on 50K samples
(reference: docs/DDPM.md "Evaluation").  This module brings the metric
on-device: batched feature extraction runs jitted on TPU, and the Fréchet
distance is computed on host in float64.

Extractors are pluggable ``f(images_uint8_nhwc) -> [N, D]``:
  - ``CLIPFeatureExtractor`` — CLIP-FID (Kynkäänniemi et al. 2022), using our
    Flax CLIP image tower with locally-provided weights (zero-egress safe).
  - any user-supplied callable (e.g. a Flax InceptionV3 port) plugs in the
    same way; classic Inception-FID numbers require the standard
    pt_inception-2015-12-05 weights, supplied locally.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np

Array = "np.ndarray"


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature matrix [N, D] in float64."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (the FID formula)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    m1, s1 = compute_statistics(feats1)
    m2, s2 = compute_statistics(feats2)
    return frechet_distance(m1, s1, m2, s2)


class CLIPFeatureExtractor:
    """CLIP image-tower features for CLIP-FID, jitted on TPU.

    Construct from a LOCAL HF CLIP checkpoint (FlaxCLIPModel-compatible), or
    pass (module, params) directly.
    """

    def __init__(self, clip_pretrained: Optional[str] = None, module=None, params=None,
                 image_size: int = 224, batch_size: int = 256):
        import jax
        import jax.numpy as jnp

        if module is None:
            from transformers import FlaxCLIPModel

            m = FlaxCLIPModel.from_pretrained(clip_pretrained)
            module, params = m.module, {"params": m.params}
        self.module, self.params = module, params
        self.image_size = image_size
        self.batch_size = batch_size
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

        def image_features(m, pixel_values):
            # FlaxCLIPModule (the .module of FlaxCLIPModel) has no
            # get_image_features method — project the vision pooler output
            # explicitly; keep supporting injected modules that do have it.
            if hasattr(m, "get_image_features"):
                return m.get_image_features(pixel_values=pixel_values)
            pooled = m.vision_model(pixel_values=pixel_values)[1]
            return m.visual_projection(pooled)

        def extract(p, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            b = x.shape[0]
            x = jax.image.resize(x, (b, image_size, image_size, 3), "bilinear")
            x = (x - mean) / std
            # NHWC: the raw Flax module wants channels-last (only the
            # FlaxCLIPModel WRAPPER accepts NCHW and transposes internally)
            feats = self.module.apply(p, pixel_values=x, method=image_features)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        self._extract = jax.jit(extract)

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        out = []
        for i in range(0, len(images_u8), self.batch_size):
            batch = jnp.asarray(images_u8[i:i + self.batch_size])
            out.append(np.asarray(self._extract(self.params, batch)))
        return np.concatenate(out)


def compute_fid(
    images1_u8: Iterable[np.ndarray],
    images2_u8: Iterable[np.ndarray],
    extractor: Callable[[np.ndarray], np.ndarray],
) -> float:
    """FID between two uint8 NHWC image sets via the given extractor."""
    f1 = extractor(np.asarray(images1_u8))
    f2 = extractor(np.asarray(images2_u8))
    return fid_from_features(f1, f2)


def polynomial_mmd2(f1: np.ndarray, f2: np.ndarray, degree: int = 3,
                    gamma: Optional[float] = None, coef0: float = 1.0) -> float:
    """Unbiased MMD² with the polynomial kernel k(x,y) = (γ x·y + c)^d —
    the KID kernel (Bińkowski et al. 2018, arXiv:1801.01401; defaults are
    torch-fidelity's: d=3, γ=1/dim, c=1)."""
    f1 = np.asarray(f1, np.float64)
    f2 = np.asarray(f2, np.float64)
    if len(f1) < 2 or len(f2) < 2:
        raise ValueError(
            f"unbiased MMD^2 needs >= 2 samples per set, got {len(f1)}/{len(f2)}")
    if gamma is None:
        gamma = 1.0 / f1.shape[1]
    kxx = (gamma * (f1 @ f1.T) + coef0) ** degree
    kyy = (gamma * (f2 @ f2.T) + coef0) ** degree
    kxy = (gamma * (f1 @ f2.T) + coef0) ** degree
    m, n = len(f1), len(f2)
    term_x = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    term_y = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    return float(term_x + term_y - 2.0 * kxy.mean())


def kid_from_features(feats1: np.ndarray, feats2: np.ndarray,
                      subsets: int = 100, subset_size: int = 1000,
                      seed: int = 0) -> Tuple[float, float]:
    """Kernel Inception Distance: mean ± std of unbiased polynomial MMD²
    over ``subsets`` random subsets of size ``subset_size`` (torch-fidelity
    procedure and defaults; subset size is clamped to the smaller set)."""
    feats1 = np.asarray(feats1)
    feats2 = np.asarray(feats2)
    rng = np.random.RandomState(seed)
    n = min(subset_size, len(feats1), len(feats2))
    vals = []
    for _ in range(subsets):
        a = feats1[rng.choice(len(feats1), n, replace=False)]
        b = feats2[rng.choice(len(feats2), n, replace=False)]
        vals.append(polynomial_mmd2(a, b))
    return float(np.mean(vals)), float(np.std(vals))


def inception_score(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """Inception Score from class probabilities [N, K]: exp(E KL(p(y|x)||p(y))).

    (The reference reports IS via torch-fidelity; the classifier producing
    ``probs`` is pluggable — e.g. our ADM EncoderUNetModel at t=0, or an
    InceptionV3 port with locally-supplied weights.)
    """
    probs = np.asarray(probs, np.float64)
    n = len(probs)
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        marginal = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + 1e-16) - np.log(marginal + 1e-16)), axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
