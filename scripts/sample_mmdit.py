"""MMDiT (SD3-class) flow-matching sampling CLI (beyond parity).

Completes the MMDiT family's serving surface: classifier-free-guided
rectified-flow sampling over an MMDiT trained with cached text embeddings
(scripts/train_mmdit.py) or converted from an SD3-release checkpoint
(dmtpu/convert/zoo.py::convert_mmdit).  Follows the reference's sampling-CLI
shape (reference: scripts/sample_cfg.py — config + weights + amortized
folds + grid saving), with conditioning from the cached-embedding workflow
(no text tower runs inside the compiled sampler).

Conditioning sources (exactly one):
  --embeddings emb.npz   arrays ``context`` [L,Dc] or [N,L,Dc] and
                         ``pooled`` [Dp] or [N,Dp]; N entries cycle over the
                         requested samples
  --class_idx K          pull class-K's embedding from the config's
                         SyntheticEmbedded-style dataset (the train_mmdit
                         smoke-checkpoint workflow)
  --prompt "..."         deterministic PSEUDO-embeddings hashed from the
                         text — demo mode, random-init weights only (same
                         rule as sample_sd.py's pseudo-tokens)

Weights: orbax train-state dir (EMA preferred) / .npz export / SD3
``.safetensors``/``.ckpt`` (converted through ``convert_mmdit``; set
``model.params.pos_embed_max_size`` to the release's base grid, 192 for
SD3-medium).  Omit --weights for random-init demo mode.

If the config has a ``vae`` section the sampled latents are decoded
(z / scale_factor + shift_factor -> decoder); --vae_weights loads its
params (.npz), else the decoder is random-init (demo).
"""
import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax(distributed=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.convert import convert_mmdit  # noqa: E402
from dmtpu.diffusions import (FlowDPMSolver, FlowDPMSolverCFG,  # noqa: E402
                              FlowMatching, FlowMatchingCFG)
from dmtpu.utils.config import instantiate_from_config  # noqa: E402
from dmtpu.utils.image import save_image  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402
from dmtpu.utils.misc import amortize  # noqa: E402
from _common import DataParallelSampler, load_conf, load_model_params  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--weights", type=str, default=None,
                   help="orbax dir / .npz / SD3 .safetensors|.ckpt; omit for "
                        "random-init demo mode")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=4.0,
                   help="1.0 disables CFG (single conditional call)")
    p.add_argument("--respace_type", type=str, default="uniform")
    p.add_argument("--respace_steps", type=int, default=None)
    p.add_argument("--solver", type=str, choices=["euler", "heun", "dpm"],
                   default=None, help="dpm = FlowDPM 2nd-order multistep")
    p.add_argument("--time_shift", type=float, default=None,
                   help="SD3 resolution time shift (3.0 for SD3-medium)")
    src = p.add_mutually_exclusive_group()
    src.add_argument("--embeddings", type=str, default=None,
                     help=".npz with 'context'/'pooled' cached embeddings")
    src.add_argument("--class_idx", type=int, default=None,
                     help="conditioning from the config dataset's class K")
    src.add_argument("--prompt", type=str, default=None,
                     help="demo pseudo-embeddings (random init only)")
    p.add_argument("--context_len", type=int, default=None,
                   help="pseudo-embedding context length (default: dataset's)")
    p.add_argument("--vae_weights", type=str, default=None)
    return p


def _load_params(path, model, init_args, logger):
    """orbax dir (EMA) / .npz export / SD3 torch checkpoint / None (demo).

    Checkpoint-layout logic lives in _common.load_model_params; this only
    adds the random-init demo branch and the SD3-specific key mapping."""
    if path is None:
        logger.warning("no --weights: RANDOM init (demo mode)")
        return jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    if not (os.path.isdir(path) or path.endswith(".npz")):
        logger.info(f"Converting {path} through convert_mmdit")
    return load_model_params(path, model, init_args, converter=convert_mmdit)


def _conditioning(args, conf, model, logger):
    """-> (context [N,L,Dc], pooled [N,Dp]) host arrays; N >= 1 rows cycle."""
    if args.embeddings is not None:
        data = dict(np.load(args.embeddings))
        ctx, pool = np.asarray(data["context"]), np.asarray(data["pooled"])
        # ranks are independent: context may be [L,Dc] or [N,L,Dc] and
        # pooled [Dp] or [N,Dp] in any combination
        if ctx.ndim == 2:
            ctx = ctx[None]
        if pool.ndim == 1:
            pool = pool[None]
        if ctx.shape[0] != pool.shape[0]:
            raise SystemExit(
                f"--embeddings row-count mismatch: context has "
                f"{ctx.shape[0]} rows, pooled {pool.shape[0]}")
        return ctx.astype(np.float32), pool.astype(np.float32)
    if args.class_idx is not None:
        ds = instantiate_from_config(conf.data)
        n_classes = conf.data.params.get("n_classes", 1)
        if not 0 <= args.class_idx < min(n_classes, len(ds)):
            raise SystemExit(
                f"--class_idx {args.class_idx} out of range [0, {n_classes})")
        # SyntheticEmbedded-style datasets correlate class = index % n_classes,
        # so item[class_idx] carries class_idx's cached embedding
        item = ds[args.class_idx]
        if not (isinstance(item, dict) and {"context", "pooled"} <= set(item)):
            raise SystemExit("--class_idx needs a dataset with cached "
                             "'context'/'pooled' embeddings per item")
        return (np.asarray(item["context"])[None].astype(np.float32),
                np.asarray(item["pooled"])[None].astype(np.float32))
    # pseudo-embeddings from the prompt text (demo)
    if args.weights is not None:
        raise SystemExit(
            "--prompt pseudo-embeddings are only allowed with random-init "
            "demo mode; real checkpoints need --embeddings or --class_idx "
            "(cached-embedding workflow)")
    text = args.prompt or ""
    mp = conf.model.params
    lctx = args.context_len or conf.data.params.get("context_len", 77)
    # hashlib, not hash(): python salts str hashes per process, which would
    # silently break cross-run determinism of the pseudo-embeddings
    import hashlib
    digest = hashlib.sha256(f"dmtpu-mmdit:{text}".encode()).digest()
    rs = np.random.RandomState(int.from_bytes(digest[:4], "little"))
    logger.warning(f"pseudo-embeddings for prompt {text!r} (demo mode)")
    return (rs.randn(1, lctx, mp.context_dim).astype(np.float32),
            rs.randn(1, mp.pooled_dim).astype(np.float32))


def main():
    args, unknown = get_parser().parse_known_args()
    conf = load_conf(args, unknown)
    logger = get_logger()
    rng = jax.random.PRNGKey(args.seed)

    img_size = conf.data.params.img_size
    img_ch = conf.data.get("img_channels", conf.model.params.get("in_channels", 3))
    shape = (img_size, img_size, img_ch)

    model = instantiate_from_config(conf.model)
    ctx_np, pool_np = _conditioning(args, conf, model, logger)
    lctx = ctx_np.shape[1]
    init_args = (jnp.zeros((1,) + shape), jnp.zeros((1,)),
                 {"context": jnp.zeros((1, lctx, model.context_dim)),
                  "pooled": jnp.zeros((1, model.pooled_dim))})
    dp = DataParallelSampler(_load_params(args.weights, model, init_args, logger))
    params = dp.params
    logger.info(f"MMDiT loaded (data-parallel over {dp.ndev} device(s))")

    dparams = dict(conf.diffusion.get("params", {}))
    if args.respace_steps is not None:
        dparams.update(respace_type=args.respace_type,
                       respace_steps=args.respace_steps)
    if args.solver is not None:
        dparams["solver"] = args.solver
    if args.time_shift is not None:
        dparams["time_shift"] = args.time_shift
    gs = args.guidance_scale
    # solver precedence: CLI --solver > params.solver > the config's
    # diffusion.target class (a FlowDPMSolver[CFG] target with no solver
    # param must not silently degrade to first-order Euler)
    solver = dparams.get("solver")
    if solver is None and "FlowDPM" in str(conf.diffusion.get("target", "")):
        solver = "dpm"
    if solver == "dpm":
        cls = FlowDPMSolverCFG if gs != 1.0 else FlowDPMSolver
    else:
        cls = FlowMatchingCFG if gs != 1.0 else FlowMatching
    dparams.pop("guidance_scale", None)  # CLI -s owns the scale
    if gs != 1.0:
        diffuser = cls(guidance_scale=gs, **dparams)
    else:
        diffuser = cls(**dparams)

    # optional latent decoding (SD3 workflow)
    decode = None
    if conf.get("vae"):
        vae = instantiate_from_config(conf.vae)
        scale = float(conf.vae.get("scale_factor", 1.0))
        shift = float(conf.vae.get("shift_factor", 0.0))
        if args.vae_weights:
            vdata = dict(np.load(args.vae_weights, allow_pickle=True))
            vae_params = jax.tree.map(jnp.asarray, vdata["params"].item())
        else:
            logger.warning("vae: RANDOM init (demo mode)")
            # method= is not a jit-able arg; close over it instead
            vae_params = jax.jit(lambda r, z: vae.init(r, z, method=vae.decode))(
                jax.random.PRNGKey(1), jnp.zeros((1,) + shape))
        decode = jax.jit(lambda z: vae.apply(
            vae_params, z / scale + shift, method=vae.decode))

    def model_fn(x, t, y=None, **kw):
        return model.apply(params, x, t, y)

    @jax.jit
    def sample_fn(noise, key, y, null_y):
        if gs != 1.0:
            return diffuser.sample(model_fn, noise, key,
                                   uncond_conditioning=null_y,
                                   model_kwargs={"y": y})
        return diffuser.sample(model_fn, noise, key, model_kwargs={"y": y})

    os.makedirs(args.save_dir, exist_ok=True)
    idx = 0
    for i, bs in enumerate(amortize(args.n_samples, args.batch_size)):
        rows = (np.arange(idx, idx + bs)) % len(ctx_np)
        y = {"context": jnp.asarray(ctx_np[rows]),
             "pooled": jnp.asarray(pool_np[rows])}
        null_y = model.null_conditioning(bs, lctx)
        k_noise, k_samp = jax.random.split(jax.random.fold_in(rng, i))
        noise = jax.random.normal(k_noise, (bs,) + shape)
        batch, true_bs = dp.pad_shard((noise, y, null_y))
        out = dp.gather(sample_fn(batch[0], k_samp, batch[1], batch[2]), true_bs)
        if decode is not None:
            out = np.asarray(decode(jnp.asarray(out)))
        out = np.clip(out, -1, 1)
        for img in out:
            if dp.is_main:
                save_image(img, os.path.join(args.save_dir, f"{idx}.png"))
            idx += 1
        logger.info(f"Sampled {idx}/{args.n_samples}")
    logger.info(f"Done -> {args.save_dir}")


if __name__ == "__main__":
    main()
