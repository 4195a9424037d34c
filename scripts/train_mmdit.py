"""MMDiT rectified-flow training (beyond parity — no reference counterpart).

Text-to-image training with PRECOMPUTED text embeddings: the dataset emits
``{"image", "context", "pooled"}`` (the cached-embedding workflow — captions
are embedded once offline, so no text tower runs in the compiled step) and
the whole step (micro batches + grad all-reduce + clip + optimizer + EMA) is
one compiled, mesh-sharded function, exactly like scripts/train_ddpm.py.

Conditioning dropout for CFG happens INSIDE the model per sample
(``MMDiT.cond_dropout_prob`` + the loss rng), and periodic eval sampling
runs classifier-free-guided flow sampling against the same all-zeros null
the dropout produces.

Usage:
    python scripts/train_mmdit.py -c configs/mmdit_flow_synthetic.yaml
        [-e EXP_DIR] [-r best|latest|PATH] [-ni] [key.sub=value ...]
"""
import argparse
import math
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.diffusions import FlowMatching, FlowMatchingCFG  # noqa: E402
from dmtpu.parallel import (  # noqa: E402
    TrainState,
    make_diffusion_loss_fn,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from dmtpu.utils import checkpoint as ckpt_lib  # noqa: E402
from dmtpu.utils.config import instantiate_from_config, load_config, merge_dotlist  # noqa: E402
from dmtpu.utils.image import save_image_grid  # noqa: E402
from dmtpu.utils.logger import StatusTracker, get_logger  # noqa: E402
from dmtpu.utils.misc import (  # noqa: E402
    check_freq,
    create_exp_dir,
    find_resume_checkpoint,
    get_data_generator,
    get_time_str,
)


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-e", "--exp_dir", type=str,
                        help="Experiment directory. Default ./runs/exp-{time}/")
    parser.add_argument("-r", "--resume", type=str,
                        help="Resume from a checkpoint: a path, `best` or `latest`")
    parser.add_argument("-ni", "--no_interaction", action="store_true", default=False)
    return parser


def main():
    args, unknown = get_parser().parse_known_args()
    args.time_str = get_time_str()
    if args.exp_dir is None:
        args.exp_dir = os.path.join("runs", f"exp-{args.time_str}")
    from _common import train_dotlist
    conf = merge_dotlist(load_config(args.config), train_dotlist(unknown))

    is_main = jax.process_index() == 0
    exp_dir = args.exp_dir
    if is_main:
        import yaml
        create_exp_dir(exp_dir, yaml.safe_dump(conf.to_dict()),
                       exist_ok=args.resume is not None,
                       time_str=args.time_str, no_interaction=args.no_interaction)
    logger = get_logger(log_file=os.path.join(exp_dir, f"output-{args.time_str}.log"),
                        is_main_process=is_main)
    tracker = StatusTracker(logger, exp_dir, print_freq=conf.train.print_freq,
                            is_main_process=is_main)
    root_rng = jax.random.fold_in(jax.random.PRNGKey(conf.get("seed", 0)),
                                  jax.process_index())
    mesh = make_mesh()
    logger.info(f"Experiment directory: {exp_dir}")
    logger.info(f"Devices: {mesh.devices.size} x {jax.devices()[0].device_kind}")

    # DATA — items must be {"image", "context", "pooled"} flat dicts
    if conf.train.batch_size % jax.process_count() != 0:
        raise ValueError("Batch size must be divisible by process count")
    per_host_bs = conf.train.batch_size // jax.process_count()
    micro_batch = conf.train.micro_batch or per_host_bs
    micro_batches = max(1, per_host_bs // micro_batch)
    train_set = instantiate_from_config(conf.data)
    probe = train_set[0]
    if not (isinstance(probe, dict) and {"image", "context", "pooled"} <= set(probe)):
        raise ValueError(
            "train_mmdit needs dataset items {'image','context','pooled'} "
            "(precomputed text embeddings), got " + str(type(probe)))
    from dmtpu.data import DataLoader
    loader = DataLoader(train_set, batch_size=per_host_bs, shuffle=True,
                        drop_last=True, seed=conf.get("seed", 0),
                        num_shards=jax.process_count(),
                        shard_index=jax.process_index(),
                        **conf.get("dataloader", {}))
    logger.info(f"Size of training set: {len(train_set)}")

    # DIFFUSER / MODEL / OPTIM — the loss diffuser must be the flow family
    diffuser = instantiate_from_config(conf.diffusion)
    if not isinstance(diffuser, FlowMatching):
        raise ValueError("train_mmdit trains the flow-matching objective; "
                         f"got diffusion.target={conf.diffusion.target}")
    model = instantiate_from_config(conf.model)
    tx = instantiate_from_config(conf.train.optim)
    from dmtpu.utils.optim import lr_fn
    lr_at = lr_fn(conf.train.optim)

    img_size = conf.data.params.img_size
    img_ch = conf.data.get("img_channels", 3)
    ctx_len = probe["context"].shape[0]
    ctx_dim = probe["context"].shape[1]
    pool_dim = probe["pooled"].shape[0]
    y0 = {"context": jnp.zeros((1, ctx_len, ctx_dim)),
          "pooled": jnp.zeros((1, pool_dim))}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(conf.get("seed", 0)),
        jnp.zeros((1, img_size, img_size, img_ch)), jnp.zeros((1,)), y0)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"Model parameters: {n_params / 1e6:.2f}M")

    state = TrainState.create(params, tx, ema_decay=conf.train.ema_decay,
                              ema_gradual=conf.train.get("ema_gradual", True),
                              ema_dtype=conf.train.get("ema_dtype"))
    step = 0
    if args.resume is not None:
        path = find_resume_checkpoint(exp_dir, args.resume)
        state = ckpt_lib.load_checkpoint(path, state)
        step = int(state.step)
        logger.info(f"Resumed from {path} at step {step}")
    state = shard_train_state(state, mesh)

    # the dict batch's context/pooled ride through make_diffusion_loss_fn's
    # model_kwargs; this adapter packs them into MMDiT's y pytree and routes
    # the loss rng into the per-sample conditioning dropout
    def apply_fn(p, x, t, rngs=None, context=None, pooled=None, **kw):
        drop_rng = None if rngs is None else rngs.get("dropout")
        return model.apply(p, x, t, {"context": context, "pooled": pooled},
                           train=True, force_drop_rng=drop_rng)

    loss_fn = make_diffusion_loss_fn(
        diffuser, apply_fn, total_steps=conf.diffusion.params.total_steps)
    train_step = make_train_step(loss_fn, tx,
                                 clip_grad_norm=conf.train.clip_grad_norm,
                                 micro_batches=micro_batches, mesh=mesh)

    # eval sampling: CFG flow sampling of the first n_samples items'
    # conditioning against the all-zeros null (same null as the dropout).
    # The config's diffusion target may itself be FlowMatchingCFG (the
    # isinstance gate above allows subclasses) — strip its CFG-specific keys
    # so they don't collide with the explicit ones here.
    n_samples = conf.train.n_samples
    diff_params = {k: v for k, v in dict(conf.diffusion.params).items()
                   if k not in ("guidance_scale", "cond_kwarg",
                                "guidance_interval")}
    gs = float(conf.train.get(
        "sample_guidance_scale",
        conf.diffusion.params.get("guidance_scale", 2.0)))
    sampler = FlowMatchingCFG(guidance_scale=gs, cond_kwarg="y", **diff_params)
    eval_y = {
        "context": jnp.asarray(np.stack(
            [train_set[i]["context"] for i in range(n_samples)])),
        "pooled": jnp.asarray(np.stack(
            [train_set[i]["pooled"] for i in range(n_samples)])),
    }
    null_y = jax.tree.map(jnp.zeros_like, eval_y)

    @jax.jit
    def sample_fn(p, noise):
        return sampler.sample(
            lambda x, t, y=None, **kw: model.apply(p, x, t, y),
            noise, None, uncond_conditioning=null_y, model_kwargs={"y": eval_y})

    def sample_and_save(savepath, key):
        p = state.ema.shadow if state.ema is not None else state.params
        noise = jax.random.normal(key, (n_samples, img_size, img_size, img_ch))
        samples = np.clip(np.asarray(sample_fn(p, noise)), -1, 1)
        if is_main:
            save_image_grid(samples, savepath, nrow=math.ceil(math.sqrt(n_samples)))

    logger.info("Start training...")
    gen = get_data_generator(loader)
    from dmtpu.utils.profiling import StepTimer
    timer = StepTimer()
    pending = []
    while step < conf.train.n_steps:
        batch = shard_batch(
            jax.tree.map(lambda a: np.asarray(a, np.float32), next(gen)), mesh)
        rng = jax.random.fold_in(root_rng, step)
        state, metrics = train_step(state, batch, rng)
        timer.tick()
        # buffer device scalars; fetching every step would serialise on host
        # round-trips (same deferred-sync pattern as train_ddpm.py)
        # throughput is recorded at tick time so the flushed history keeps
        # the true per-step reading instead of flattening to the flush-time
        # value (advisor round-4 finding)
        pending.append((step, metrics, timer.throughput(conf.train.batch_size)))
        if check_freq(conf.train.print_freq, step) or step + 1 == conf.train.n_steps:
            for s_, m_, tput_ in pending:
                tracker.track_status(
                    "Train",
                    {"loss": m_["loss"], "grad_norm": m_["grad_norm"],
                     "lr": lr_at(s_),
                     "imgs_per_sec": tput_},
                    s_)
            pending.clear()
        if check_freq(conf.train.save_freq, step):
            ckpt_lib.save_checkpoint(os.path.join(exp_dir, "ckpt"), step, state)
        if check_freq(conf.train.sample_freq, step):
            sample_and_save(os.path.join(exp_dir, "samples", f"step{step:0>6d}.png"),
                            jax.random.fold_in(root_rng, 2 ** 30 + step))
        step += 1
    if not check_freq(conf.train.save_freq, step - 1):
        ckpt_lib.save_checkpoint(os.path.join(exp_dir, "ckpt"), step - 1, state)
    tracker.close()
    logger.info("End of training")


if __name__ == "__main__":
    main()
