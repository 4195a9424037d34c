"""FID / Inception Score evaluation CLI.

The reference computes FID/IS externally with torch-fidelity on 50K samples
(reference: docs/DDPM.md "Evaluation"); this brings the same workflow
in-framework, on-device:

    python scripts/evaluate.py --real_dir DIR --fake_dir DIR \
        [--inception_weights pt_inception-2015-12-05.pth]     # classic FID+IS
        [--clip_pretrained /local/clip]                        # CLIP-FID

With ``--inception_weights`` (the standard pt_inception file, supplied
locally): classic FID on pool3 features + IS on the 1008-way logits —
directly comparable to the reference's published tables (BASELINE.md).
With ``--clip_pretrained``: CLIP-FID (Kynkäänniemi et al. 2022).
"""
import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import numpy as np  # noqa: E402

from dmtpu.utils.logger import get_logger  # noqa: E402


def load_images_u8(path: str, img_size: int = None, limit: int = 0) -> np.ndarray:
    """Directory of images -> uint8 NHWC array.

    ``img_size=None`` (default) keeps the NATIVE resolution of the first
    image (stragglers are resized to it) — matching torch-fidelity, which
    feeds full-resolution images and lets the Inception pipeline do the
    299² resize.  An explicit ``img_size`` force-resizes everything.
    """
    from PIL import Image

    files = []
    for root, _, names in os.walk(path):
        files += [os.path.join(root, n) for n in names
                  if n.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))]
    files.sort()
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    size = (img_size, img_size) if img_size else None
    ims = []
    for f in files:
        im = Image.open(f).convert("RGB")
        if size is None:
            size = im.size  # native (w, h) of the first image
        if im.size != size:
            im = im.resize(size, Image.BICUBIC)
        ims.append(np.asarray(im))
    return np.stack(ims)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--img_size", type=int, default=None,
                   help="force-resize images before extraction "
                        "(default: keep native resolution, like torch-fidelity)")
    p.add_argument("--n_max", type=int, default=0, help="cap images per side (0 = all)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--inception_weights", default=None,
                   help="local pt_inception-2015-12-05 .pth -> classic FID + IS")
    p.add_argument("--clip_pretrained", default=None,
                   help="local HF CLIP checkpoint -> CLIP-FID")
    p.add_argument("--is_splits", type=int, default=10)
    p.add_argument("--kid", action="store_true",
                   help="also report KID (unbiased polynomial MMD^2, "
                        "torch-fidelity procedure) on the Inception features")
    p.add_argument("--kid_subsets", type=int, default=100)
    p.add_argument("--kid_subset_size", type=int, default=1000)
    args = p.parse_args()
    logger = get_logger()

    if not args.inception_weights and not args.clip_pretrained:
        p.error("provide --inception_weights (classic FID/IS) and/or --clip_pretrained (CLIP-FID)")
    if args.kid and not args.inception_weights:
        p.error("--kid computes KID on Inception pool3 features; it needs --inception_weights")

    real = load_images_u8(args.real_dir, args.img_size, args.n_max)
    fake = load_images_u8(args.fake_dir, args.img_size, args.n_max)
    logger.info(f"real: {real.shape}  fake: {fake.shape}")

    from dmtpu.eval import compute_fid, inception_score
    from dmtpu.eval.fid import fid_from_features

    results = {}
    if args.inception_weights:
        from dmtpu.eval import InceptionFeatureExtractor

        ext = InceptionFeatureExtractor(args.inception_weights, batch_size=args.batch_size)
        # one network sweep per image set: FID uses pool3, IS reuses the
        # probs from the same fake-set pass (and KID the same features)
        fake_pool3, fake_probs = ext.features_and_probs(fake)
        real_pool3 = ext(real)
        results["fid"] = fid_from_features(real_pool3, fake_pool3)
        m, s = inception_score(fake_probs, splits=args.is_splits)
        results["is_mean"], results["is_std"] = m, s
        if args.kid:
            from dmtpu.eval.fid import kid_from_features

            km, ks = kid_from_features(real_pool3, fake_pool3,
                                       subsets=args.kid_subsets,
                                       subset_size=args.kid_subset_size)
            results["kid_mean"], results["kid_std"] = km, ks
    if args.clip_pretrained:
        from dmtpu.eval import CLIPFeatureExtractor

        ext = CLIPFeatureExtractor(args.clip_pretrained, batch_size=args.batch_size)
        results["clip_fid"] = compute_fid(real, fake, ext)

    # KID magnitudes are ~1e-3/1e-4 — full precision for those, 4 dp for the rest
    print(json.dumps({k: (float(v) if k.startswith("kid") else round(float(v), 4))
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
