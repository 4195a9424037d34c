"""DDIB: class-A → class-B translation via DDIM inversion + sampling.

(CLI parity: reference scripts/sample_ddib.py:121-157.)  Both traversals run
in one jitted function.
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
from dmtpu.diffusions import DDIM  # noqa: E402
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image_grid  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--class_A", type=int, required=True)
    p.add_argument("--class_B", type=int, required=True)
    p.add_argument("--n_samples", type=int, default=None)
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()

    shape = image_shape(conf)
    diffuser = DDIM(**diffusion_params(args, conf))
    model = instantiate_from_config(conf.model)
    from _common import DataParallelSampler

    dp = DataParallelSampler(load_model_params(
        args.weights, model,
        (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)),
    ))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    @jax.jit
    def translate_jit(prm, img):
        def model_fn_A(x, t, **kw):
            return model.apply(prm, x, t, jnp.full((x.shape[0],), args.class_A, jnp.int32))

        def model_fn_B(x, t, **kw):
            return model.apply(prm, x, t, jnp.full((x.shape[0],), args.class_B, jnp.int32))

        noise = diffuser.sample_inversion(model_fn_A, img)
        return diffuser.sample(model_fn_B, noise, jax.random.PRNGKey(0))

    dataset = ImageDir(args.input_dir, img_size=shape[0])
    n = min(args.n_samples or len(dataset), len(dataset))
    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(0, n, args.batch_size):
        batch = np.stack([dataset[j] for j in range(i, min(i + args.batch_size, n))])
        batch_sh, nb = dp.pad_shard(jnp.asarray(batch))
        out = np.clip(np.asarray(translate_jit(params, batch_sh))[:nb], -1, 1)
        for b in range(len(batch)):
            save_image_grid(np.stack([batch[b], out[b]]),
                            os.path.join(args.save_dir, f"{i + b}.png"), nrow=2)
        logger.info(f"Translated {min(i + args.batch_size, n)}/{n}")
    logger.info("Done")


if __name__ == "__main__":
    main()
