"""CLIP-guided text-conditional sampling.

(CLI parity: reference scripts/sample_clip_guidance.py:101-158.)  Requires a
LOCAL CLIP checkpoint (zero-egress environments cannot download
``openai/clip-vit-base-patch32``).
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

from dmtpu.diffusions.guidance import CLIPGuidance  # noqa: E402
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402
from dmtpu.utils.misc import amortize  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--text", type=str, required=True)
    p.add_argument("--guidance_weight", type=float, default=100.0)
    p.add_argument("--clip_pretrained", type=str, default="openai/clip-vit-base-patch32",
                   help="Local path to a HF CLIP checkpoint")
    p.add_argument("--n_samples", type=int, required=True)
    p.add_argument("--var_type", type=str, default=None)
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    shape = image_shape(conf)
    extra = {"var_type": args.var_type} if args.var_type else {}
    diffuser = CLIPGuidance(guidance_weight=args.guidance_weight,
                            clip_pretrained=args.clip_pretrained,
                            **diffusion_params(args, conf, **extra))
    diffuser.set_text(args.text)
    model = instantiate_from_config(conf.model)
    from _common import DataParallelSampler

    dp = DataParallelSampler(load_model_params(
        args.weights, model, (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32))))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights}; text: {args.text!r} "
                f"(data-parallel over {dp.ndev} device(s))")

    @jax.jit
    def sample_jit(prm, noise, key):
        def model_fn(x, t, **kw):
            return model.apply(prm, x, t)

        return diffuser.sample(model_fn, noise, key)

    os.makedirs(args.save_dir, exist_ok=True)
    idx = 0
    for i, bs in enumerate(amortize(args.n_samples, args.batch_size)):
        k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
        noise, bs = dp.pad_shard(jax.random.normal(k_noise, (bs,) + shape))
        out = np.clip(np.asarray(sample_jit(params, noise, k_samp))[:bs], -1, 1)
        for img in out:
            save_image(img, os.path.join(args.save_dir, f"{idx}.png"))
            idx += 1
        logger.info(f"Sampled {idx}/{args.n_samples}")
    logger.info("Done")


if __name__ == "__main__":
    main()
