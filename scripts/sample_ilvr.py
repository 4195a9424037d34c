"""ILVR sampling from reference images.

(CLI parity: reference scripts/sample_ilvr.py:101-161.)
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
from dmtpu.diffusions.guidance import ILVR  # noqa: E402
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image_grid  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--input_dir", type=str, required=True,
                   help="Directory of reference images")
    p.add_argument("--downsample_factor", type=int, default=8)
    p.add_argument("--interp_method", type=str, default="cubic",
                   choices=["cubic", "lanczos2", "lanczos3", "linear", "box"])
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--var_type", type=str, default=None)
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    shape = image_shape(conf)
    extra = {"var_type": args.var_type} if args.var_type else {}
    diffuser = ILVR(downsample_factor=args.downsample_factor,
                    interp_method=args.interp_method,
                    **diffusion_params(args, conf, **extra))
    model = instantiate_from_config(conf.model)
    from _common import DataParallelSampler

    dp = DataParallelSampler(load_model_params(
        args.weights, model, (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32))))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    @jax.jit
    def ilvr_jit(prm, refs, noise, key):
        def model_fn(x, t, **kw):
            return model.apply(prm, x, t)

        diffuser.set_ref_images(refs)
        return diffuser.sample(model_fn, noise, key)

    dataset = ImageDir(args.input_dir, img_size=shape[0])
    n = min(args.n_samples or len(dataset), len(dataset))
    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(0, n, args.batch_size):
        refs = np.stack([dataset[j] for j in range(i, min(i + args.batch_size, n))])
        k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
        noise = jax.random.normal(k_noise, refs.shape)
        (refs_sh, noise), nb = dp.pad_shard((jnp.asarray(refs), noise))
        out = np.clip(np.asarray(ilvr_jit(params, refs_sh, noise, k_samp))[:nb], -1, 1)
        for b in range(len(refs)):
            save_image_grid(np.stack([refs[b], out[b]]),
                            os.path.join(args.save_dir, f"{i + b}.png"), nrow=2)
        logger.info(f"Sampled {min(i + args.batch_size, n)}/{n}")
    logger.info("Done")


if __name__ == "__main__":
    main()
