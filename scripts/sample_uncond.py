"""Unconditional sampling with 5 modes (CLI parity: reference scripts/sample_uncond.py).

Modes (reference :22-27 compatibility matrix):
  sample / denoise (intermediate x_t grid) / progressive (pred_x0 grid) /
  interpolate (slerp between two noises) / reconstruction (DDIM invert+decode)

TPU-native: each fold is one jitted scan; per-step intermediates for
denoise/progressive come from the scan's stacked outputs.
"""
import argparse
import math
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

from dmtpu.utils.setup import setup_jax  # noqa: E402

# distributed=True is inert without JAX_COORDINATOR_ADDRESS; with it, folds
# are data-parallel across ALL processes' devices and only process 0 saves
setup_jax(distributed=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.data import ImageDir  # noqa: E402
from dmtpu.diffusions import (  # noqa: E402
    DDIM,
    DDPM,
    DPMSolverPP,
    EulerSampler,
    FlowDPMSolver,
    FlowMatching,
    HeunSampler,
    PFDiffDDIM,
)
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image, save_image_grid  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402
from dmtpu.utils.misc import amortize  # noqa: E402
from _common import (  # noqa: E402
    DataParallelSampler,
    base_parser,
    diffusion_params,
    load_conf,
    load_model_params,
)

COMPATIBLE_SAMPLER_MODE = dict(
    ddpm=["sample", "denoise", "progressive"],
    ddim=["sample", "denoise", "progressive", "interpolate", "reconstruction"],
    euler=["sample", "denoise", "progressive", "interpolate"],
    heun=["sample", "denoise", "progressive", "interpolate"],
    # beyond parity: DPM-Solver++(2M) / PFDiff-1 (no reference counterpart).
    # pfdiff excludes denoise/progressive: its collected trajectory is per
    # PAIR of grid transitions, so the reference's S-step grid math in those
    # modes does not apply.
    dpmpp=["sample", "denoise", "progressive", "interpolate"],
    pfdiff=["sample", "interpolate"],
    # flow matching (beyond parity): deterministic ODE — all five modes,
    # reconstruction via exact-tape ODE inversion
    flow=["sample", "denoise", "progressive", "interpolate", "reconstruction"],
    # FlowDPM (beyond parity): 2nd-order multistep over the flow ODE; its
    # inversion falls back to first-order Euler so reconstruction is
    # excluded (the multistep history has no exact reverse tape)
    flowdpm=["sample", "denoise", "progressive", "interpolate"],
)


def get_parser():
    p = base_parser()
    p.set_defaults(batch_size=500)
    p.add_argument("--n_samples", type=int, required=True)
    p.add_argument("--sampler", type=str, choices=list(COMPATIBLE_SAMPLER_MODE), default="ddpm")
    p.add_argument("--var_type", type=str, default=None)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    # default=None so an absent flag defers to the config's `solver` (like
    # --time_shift below) instead of clobbering it with "euler"
    p.add_argument("--flow_solver", type=str, choices=["euler", "heun"], default=None)
    p.add_argument("--time_shift", type=float, default=None,
                   help="SD3-style flow time shift (flow sampler only)")
    p.add_argument("--mode", type=str, default="sample",
                   choices=["sample", "denoise", "progressive", "interpolate", "reconstruction"])
    p.add_argument("--n_denoise", type=int, default=20)
    p.add_argument("--n_progressive", type=int, default=20)
    p.add_argument("--n_interpolate", type=int, default=16)
    p.add_argument("--input_dir", type=str, required=False)
    return p


def build_diffuser(args, conf):
    extra = {}
    if args.var_type is not None:
        extra["var_type"] = args.var_type
    if args.sampler == "ddim":
        extra["eta"] = args.ddim_eta
    if args.sampler == "flow":
        if args.flow_solver is not None:
            extra["solver"] = args.flow_solver
        if args.time_shift is not None:
            extra["time_shift"] = args.time_shift
    if args.sampler == "flowdpm":
        if args.flow_solver is not None:
            raise SystemExit("--flow_solver applies to the flow sampler only; "
                             "flowdpm IS the solver")
        if args.time_shift is not None:
            extra["time_shift"] = args.time_shift
        extra["solver"] = "dpm"   # overrides a flow config's euler/heun
    cls = {"ddpm": DDPM, "ddim": DDIM, "euler": EulerSampler, "heun": HeunSampler,
           "dpmpp": DPMSolverPP, "pfdiff": PFDiffDDIM, "flow": FlowMatching,
           "flowdpm": FlowDPMSolver}[args.sampler]
    return cls(**diffusion_params(args, conf, **extra))


def slerp(t, z1, z2):
    """(reference: scripts/sample_uncond.py:253-255)"""
    theta = jnp.arccos(jnp.sum(z1 * z2) / (jnp.linalg.norm(z1) * jnp.linalg.norm(z2)))
    return (jnp.sin((1 - t) * theta) / jnp.sin(theta) * z1
            + jnp.sin(t * theta) / jnp.sin(theta) * z2)


def main():
    args, unknown = get_parser().parse_known_args()
    if args.mode not in COMPATIBLE_SAMPLER_MODE[args.sampler]:
        raise ValueError(f"mode {args.mode} is incompatible with sampler {args.sampler}")
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    img_size = conf.data.params.img_size
    img_ch = conf.data.get("img_channels", 3)
    shape = (img_size, img_size, img_ch)

    diffuser = build_diffuser(args, conf)
    model = instantiate_from_config(conf.model)
    dp = DataParallelSampler(load_model_params(
        args.weights, model,
        (jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32))))
    params = dp.params
    logger.info(f"Loaded weights from {args.weights} "
                f"(data-parallel over {dp.ndev} device(s))")

    def model_fn(x, t, **kw):
        return model.apply(params, x, t, **kw)

    os.makedirs(args.save_dir, exist_ok=True)
    S = len(diffuser.respaced_seq)

    if args.mode == "sample":
        @jax.jit
        def sample_fn(noise, key):
            return diffuser.sample(model_fn, noise, key)

        idx = 0
        for i, bs in enumerate(amortize(args.n_samples, args.batch_size)):
            # independent keys for the initial noise and the reverse process
            # (identical on every process — the fold's batch is then sharded
            # over the GLOBAL device set, so each process computes its slice
            # and gather() reassembles the full fold)
            k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
            noise, bs = dp.pad_shard(jax.random.normal(k_noise, (bs,) + shape))
            out = np.clip(dp.gather(sample_fn(noise, k_samp), bs), -1, 1)
            for img in out:
                if dp.is_main:
                    save_image(img, os.path.join(args.save_dir, f"{idx}.png"))
                idx += 1
            logger.info(f"Sampled {idx}/{args.n_samples}")

    elif args.mode in ("denoise", "progressive"):
        key = "sample" if args.mode == "denoise" else "pred_x0"
        freq = max(1, S // (args.n_denoise if args.mode == "denoise" else args.n_progressive))

        @jax.jit
        def loop_fn(noise, k):
            return diffuser.sample_loop(model_fn, noise, k, collect=(key,))

        idx = 0
        for i, bs in enumerate(amortize(args.n_samples, args.batch_size)):
            k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
            noise, bs = dp.pad_shard(jax.random.normal(k_noise, (bs,) + shape))
            _, ys = loop_fn(noise, k_samp)
            traj = np.clip(np.asarray(ys[key])[:, :bs], -1, 1)  # [S, B, H, W, C]
            traj = traj[::-1][::freq][::-1]  # keep every freq-th, ending at final
            for b in range(bs):
                save_image_grid(traj[:, b], os.path.join(args.save_dir, f"{idx}.png"),
                                nrow=len(traj))
                idx += 1
            logger.info(f"Sampled {idx}/{args.n_samples}")

    elif args.mode == "interpolate":
        @jax.jit
        def sample_fn(noise, key):
            return diffuser.sample(model_fn, noise, key)

        for i in range(args.n_samples):
            k = jax.random.fold_in(rng, i)
            k1, k2, k_samp = jax.random.split(k, 3)
            z1 = jax.random.normal(k1, shape)
            z2 = jax.random.normal(k2, shape)
            ts = jnp.linspace(0, 1, args.n_interpolate)
            noise, nb = dp.pad_shard(jnp.stack([slerp(t, z1, z2) for t in ts]))
            out = np.clip(np.asarray(sample_fn(noise, k_samp))[:nb], -1, 1)
            save_image_grid(out, os.path.join(args.save_dir, f"{i}.png"), nrow=args.n_interpolate)
            logger.info(f"Sampled {i + 1}/{args.n_samples}")

    elif args.mode == "reconstruction":
        assert args.input_dir, "--input_dir required for reconstruction"
        dataset = ImageDir(args.input_dir, img_size=img_size)

        @jax.jit
        def recon_fn(img):
            inverted = diffuser.sample_inversion(model_fn, img)
            return diffuser.sample(model_fn, inverted, jax.random.PRNGKey(0))

        n = min(args.n_samples, len(dataset))
        for i in range(0, n, args.batch_size):
            batch = np.stack([dataset[j] for j in range(i, min(i + args.batch_size, n))])
            sharded, nb = dp.pad_shard(jnp.asarray(batch))
            recon = np.clip(np.asarray(recon_fn(sharded))[:nb], -1, 1)
            for b in range(len(batch)):
                pair = np.stack([batch[b], recon[b]])
                save_image_grid(pair, os.path.join(args.save_dir, f"{i + b}.png"), nrow=2)
            logger.info(f"Reconstructed {min(i + args.batch_size, n)}/{n}")

    logger.info("Done")


if __name__ == "__main__":
    main()
