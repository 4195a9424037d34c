"""Evaluation: on-device FID harness."""
from dmtpu.eval.fid import (
    inception_score,
    CLIPFeatureExtractor,
    compute_fid,
    compute_statistics,
    fid_from_features,
    frechet_distance,
)

__all__ = [
    "inception_score",
    "compute_statistics",
    "frechet_distance",
    "fid_from_features",
    "compute_fid",
    "CLIPFeatureExtractor",
]
