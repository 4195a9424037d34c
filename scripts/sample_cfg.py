"""Class-conditional sampling with classifier-free guidance.

(CLI parity: reference scripts/sample_cfg.py:110-188.)  The cond/uncond pair
runs as one batched model call inside the compiled scan.
"""
import os
import sys

sys.path.append(os.path.dirname(os.path.abspath(__file__)))

from _common import (  # noqa: E402
    DataParallelSampler,
    base_parser,
    diffusion_params,
    image_shape,
    load_conf,
    load_model_params,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.diffusions import (  # noqa: E402
    DDIMCFG, DDPMCFG, DPMSolverPPCFG, FlowMatchingCFG, PFDiffDDIMCFG)
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402
from dmtpu.utils.misc import amortize  # noqa: E402


def main():
    p = base_parser()
    p.add_argument("--sampler", type=str,
                   choices=["ddpm", "ddim", "dpmpp", "pfdiff", "flow"],
                   default="ddpm")
    p.add_argument("--guidance_scale", type=float, required=True,
                   help="s=0: uncond; s=1: plain conditional; s>1: guided")
    p.add_argument("--class_ids", type=int, nargs="+", default=None,
                   help="Which classes to sample (default: all)")
    p.add_argument("--n_samples_each_class", type=int, required=True)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--guidance_interval", type=float, nargs=2, default=None,
                   metavar=("T_LO", "T_HI"),
                   help="apply CFG only when t_lo < t <= t_hi (original "
                        "timestep units); outside, one plain conditional "
                        "call per step (ddpm/ddim samplers)")
    p.add_argument("--var_type", type=str, default=None)
    p.add_argument("--vae_weights", type=str, default=None,
                   help="VAE weights for latent models (DiT/MDT wrappers)")
    args, unknown = p.parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    shape = image_shape(conf)
    num_classes = conf.data.num_classes
    class_ids = args.class_ids or list(range(num_classes))

    extra = dict(guidance_scale=args.guidance_scale)
    if args.var_type is not None:
        extra["var_type"] = args.var_type
    if args.guidance_interval is not None:
        if args.sampler not in ("ddpm", "ddim"):
            p.error("--guidance_interval supports the ddpm/ddim samplers")
        extra["guidance_interval"] = tuple(args.guidance_interval)
    if args.sampler == "ddim":
        diffuser = DDIMCFG(**diffusion_params(args, conf, **extra, eta=args.ddim_eta))
    elif args.sampler == "dpmpp":
        diffuser = DPMSolverPPCFG(**diffusion_params(args, conf, **extra))
    elif args.sampler == "pfdiff":
        diffuser = PFDiffDDIMCFG(**diffusion_params(args, conf, **extra))
    elif args.sampler == "flow":
        diffuser = FlowMatchingCFG(**diffusion_params(args, conf, **extra))
    else:
        diffuser = DDPMCFG(**diffusion_params(args, conf, **extra))

    from dmtpu.convert import load_torch_weights
    from dmtpu.models.latent import LatentDiffusionWrapper

    model = instantiate_from_config(conf.model)
    is_latent = isinstance(model, LatentDiffusionWrapper)
    if is_latent:
        # DiT/MDT: sample 4-ch latents at size/8, decode with the VAE
        # (streamlit-page semantics, reference: streamlit/pages/1_...py:86-107)
        shape = (shape[0] // 8, shape[1] // 8, 4)
        if args.weights.endswith(".npz"):
            # convert_checkpoint.py export of the full latent params tree
            data = dict(np.load(args.weights, allow_pickle=True))
            params = jax.tree.map(jnp.asarray, data["params"].item())
        else:
            vae_sd = load_torch_weights(args.vae_weights) if args.vae_weights else None
            params = model.load_state_dict(load_torch_weights(args.weights), vae_sd)
        # DiT/MDT null class row == num_classes (class_dropout_prob > 0)
    else:
        params = load_model_params(
            args.weights, model,
            (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)),
        )
    dp = DataParallelSampler(params)
    params = dp.params
    has_vae = bool(is_latent and params.get("vae"))
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    @jax.jit
    def sample_jit(prm, noise, key, y):
        # the denoiser reads the replicated `prm` ARGUMENT (not a closure
        # copy) so DP replication/sharding applies to the weights too
        def model_fn(x, t, y=None, **kw):
            if is_latent:
                return model.vit_forward(prm, x, t, y)
            return model.apply(prm, x, t, y)

        # null class == num_classes row (zero-initialised, y=None equivalent)
        z = diffuser.sample(
            model_fn, noise, key,
            uncond_conditioning=jnp.full((noise.shape[0],), num_classes, jnp.int32),
            model_kwargs=dict(y=y),
        )
        if has_vae:
            return model.decode_latent(prm, z)
        return z

    os.makedirs(args.save_dir, exist_ok=True)
    for c in class_ids:
        os.makedirs(os.path.join(args.save_dir, f"class{c}"), exist_ok=True)
        idx = 0
        for i, bs in enumerate(amortize(args.n_samples_each_class, args.batch_size)):
            k_noise, k_samp = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(rng, c), i))
            noise = jax.random.normal(k_noise, (bs,) + shape)
            y = jnp.full((bs,), c, jnp.int32)
            (noise, y), bs = dp.pad_shard((noise, y))
            out = np.clip(np.asarray(sample_jit(params, noise, k_samp, y))[:bs], -1, 1)
            for img in out:
                save_image(img, os.path.join(args.save_dir, f"class{c}", f"{idx}.png"))
                idx += 1
        logger.info(f"class {c}: {idx} samples")
    logger.info("Done")


if __name__ == "__main__":
    main()
