"""Evaluation: on-device FID/IS harness (CLIP-FID + classic Inception-FID)."""
from dmtpu.eval.fid import (
    inception_score,
    CLIPFeatureExtractor,
    compute_fid,
    compute_statistics,
    fid_from_features,
    frechet_distance,
)
from dmtpu.eval.inception import (
    FIDInceptionV3,
    InceptionFeatureExtractor,
    convert_inception_checkpoint,
)

__all__ = [
    "inception_score",
    "compute_statistics",
    "frechet_distance",
    "fid_from_features",
    "compute_fid",
    "CLIPFeatureExtractor",
    "FIDInceptionV3",
    "InceptionFeatureExtractor",
    "convert_inception_checkpoint",
]
