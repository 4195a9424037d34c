"""Inpainting with mask guidance, optionally RePaint resampling.

(CLI parity: reference scripts/sample_mask_guidance.py:132-181.)
"""
import os
import sys

sys.path.append(os.path.dirname(os.path.abspath(__file__)))

from _common import (  # noqa: E402
    base_parser,
    diffusion_params,
    image_shape,
    load_conf,
    load_model_params,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.data import ImageDir  # noqa: E402
from dmtpu.diffusions.guidance import MaskGuidance  # noqa: E402
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image_grid  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402
from dmtpu.utils.mask import DatasetWithMask  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--mask_type", type=str, default="brush")
    p.add_argument("--resample", action="store_true", help="RePaint resampling")
    p.add_argument("--resample_r", type=int, default=10)
    p.add_argument("--resample_j", type=int, default=10)
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--var_type", type=str, default=None)
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    shape = image_shape(conf)
    extra = {"var_type": args.var_type} if args.var_type else {}
    diffuser = MaskGuidance(**diffusion_params(args, conf, **extra))
    model = instantiate_from_config(conf.model)
    from _common import DataParallelSampler

    dp = DataParallelSampler(load_model_params(
        args.weights, model, (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32))))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    @jax.jit
    def inpaint_jit(prm, masked_img, mask, noise, key):
        def model_fn(x, t, **kw):
            return model.apply(prm, x, t)

        diffuser.set_mask_and_image(masked_img, mask)
        if args.resample:
            return diffuser.resample(model_fn, noise, key,
                                     resample_r=args.resample_r, resample_j=args.resample_j)
        return diffuser.sample(model_fn, noise, key)

    dataset = DatasetWithMask(ImageDir(args.input_dir, img_size=shape[0]),
                              mask_type=args.mask_type)
    n = min(args.n_samples or len(dataset), len(dataset))
    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(0, n, args.batch_size):
        items = [dataset[j] for j in range(i, min(i + args.batch_size, n))]
        imgs = np.stack([it[0] for it in items])
        masks = np.stack([it[1] for it in items])
        masked = imgs * masks
        k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
        noise = jax.random.normal(k_noise, imgs.shape)
        (masked_sh, masks_sh, noise), nb = dp.pad_shard(
            (jnp.asarray(masked), jnp.asarray(masks), noise))
        out = np.clip(np.asarray(inpaint_jit(params, masked_sh, masks_sh, noise, k_samp))[:nb], -1, 1)
        for b in range(len(imgs)):
            trip = np.stack([imgs[b], masked[b] + (1 - masks[b]) * 1.0, out[b]])
            save_image_grid(trip, os.path.join(args.save_dir, f"{i + b}.png"), nrow=3)
        logger.info(f"Inpainted {min(i + args.batch_size, n)}/{n}")
    logger.info("Done")


if __name__ == "__main__":
    main()
