"""SDEdit: stroke-guided image editing.

(CLI parity: reference scripts/sample_sdedit.py:123-168.)  Composed from
primitives: diffuse the input to t_edit, then run the tail of the reverse
scan (``start_step``) — exactly the reference's partial denoise loop.
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
from dmtpu.diffusions import DDPM  # noqa: E402
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image_grid  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--input_dir", type=str, required=True,
                   help="Directory of stroke paintings to edit")
    p.add_argument("--edit_steps", type=int, required=True,
                   help="Diffuse to this (respaced) step before denoising back")
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--var_type", type=str, default=None)
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    shape = image_shape(conf)
    extra = {"var_type": args.var_type} if args.var_type else {}
    diffuser = DDPM(**diffusion_params(args, conf, **extra))
    model = instantiate_from_config(conf.model)
    from _common import DataParallelSampler

    dp = DataParallelSampler(load_model_params(
        args.weights, model, (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32))))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    S = len(diffuser.respaced_seq)
    assert 0 < args.edit_steps <= S, f"edit_steps must be in (0, {S}]"
    t_edit = int(diffuser.respaced_seq[args.edit_steps - 1])
    start_row = S - args.edit_steps  # tape rows are in descending-t order

    @jax.jit
    def edit_jit(prm, img, key):
        def model_fn(x, t, **kw):
            return model.apply(prm, x, t)

        k1, k2 = jax.random.split(key)
        eps = jax.random.normal(k1, img.shape)
        xt = diffuser.diffuse(img, jnp.full((img.shape[0],), t_edit), eps)
        return diffuser.sample(model_fn, xt, k2, start_step=start_row)

    dataset = ImageDir(args.input_dir, img_size=shape[0])
    n = min(args.n_samples or len(dataset), len(dataset))
    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(0, n, args.batch_size):
        batch = np.stack([dataset[j] for j in range(i, min(i + args.batch_size, n))])
        k = jax.random.fold_in(rng, i)
        batch_sh, nb = dp.pad_shard(jnp.asarray(batch))
        edited = np.clip(np.asarray(edit_jit(params, batch_sh, k))[:nb], -1, 1)
        for b in range(len(batch)):
            save_image_grid(np.stack([batch[b], edited[b]]),
                            os.path.join(args.save_dir, f"{i + b}.png"), nrow=2)
        logger.info(f"Edited {min(i + args.batch_size, n)}/{n}")
    logger.info("Done")


if __name__ == "__main__":
    main()
