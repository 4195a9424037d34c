"""Unconditional DDPM training (CLI parity: reference scripts/train_ddpm.py).

Usage:
    python scripts/train_ddpm.py -c configs/ddpm_cifar10.yaml [-e EXP_DIR]
        [-r best|latest|PATH] [-ni] [key.sub=value ...]

TPU-native translation of the reference script: the whole run_step (micro
batches + grad all-reduce + clip + Adam + EMA) is one compiled, mesh-sharded
function; periodic sampling jits the full reverse scan once and reuses it.
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
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Path to training configuration file")
    parser.add_argument("-e", "--exp_dir", type=str,
                        help="Path to the experiment directory. Default ./runs/exp-{time}/")
    parser.add_argument("-r", "--resume", type=str,
                        help="Resume from a checkpoint: a path, `best` or `latest`")
    parser.add_argument("-ni", "--no_interaction", action="store_true", default=False,
                        help="Never prompt; assume yes")
    parser.add_argument("--profile", type=str, default=None,
                        help="Capture a jax.profiler trace of steps 10-15 into this dir")
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

    root_rng = jax.random.PRNGKey(conf.get("seed", 0))
    root_rng = jax.random.fold_in(root_rng, jax.process_index())

    mesh = make_mesh()
    n_dev = mesh.devices.size
    logger.info("=" * 19 + " System Info " + "=" * 18)
    logger.info(f"Experiment directory: {exp_dir}")
    logger.info(f"Devices: {n_dev} x {jax.devices()[0].device_kind}")

    # DATA
    if conf.train.batch_size % jax.process_count() != 0:
        raise ValueError("Batch size must be divisible by process count")
    per_host_bs = conf.train.batch_size // jax.process_count()
    micro_batch = conf.train.micro_batch or per_host_bs
    micro_batches = max(1, per_host_bs // micro_batch)
    train_set = instantiate_from_config(conf.data)
    loader = __import__("dmtpu.data", fromlist=["DataLoader"]).DataLoader(
        train_set, batch_size=per_host_bs, shuffle=True, drop_last=True,
        seed=conf.get("seed", 0),
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        **conf.get("dataloader", {}),
    )
    logger.info("=" * 19 + " Data Info " + "=" * 20)
    logger.info(f"Size of training set: {len(train_set)}")
    logger.info(f"Batch size per host: {per_host_bs}  total: {conf.train.batch_size}")

    # DIFFUSER / MODEL / OPTIM
    diffuser = instantiate_from_config(conf.diffusion)
    model = instantiate_from_config(conf.model)
    tx = instantiate_from_config(conf.train.optim)
    from dmtpu.utils.optim import lr_fn
    lr_at = lr_fn(conf.train.optim)
    img_size = conf.data.params.img_size
    img_ch = conf.data.img_channels
    sample_shape = (1, img_size, img_size, img_ch)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(conf.get("seed", 0)),
        jnp.zeros(sample_shape), jnp.zeros((1,), jnp.int32),
    )
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

    loss_fn = make_diffusion_loss_fn(
        diffuser, lambda p, x, t, **kw: model.apply(p, x, t, train=True, **kw),
        total_steps=conf.diffusion.params.total_steps,
    )
    train_step = make_train_step(loss_fn, tx, clip_grad_norm=conf.train.clip_grad_norm,
                                 micro_batches=micro_batches, mesh=mesh)

    # jitted sampling (EMA params as argument; compiled once)
    @jax.jit
    def sample_fn(p, noise, key):
        return diffuser.sample(lambda x, t, **kw: model.apply(p, x, t, **kw), noise, key)

    def sample_and_save(savepath: str, key):
        p = state.ema.shadow if state.ema is not None else state.params
        n = conf.train.n_samples
        k_noise, k_samp = jax.random.split(key)
        noise = jax.random.normal(k_noise, (n, img_size, img_size, img_ch))
        samples = np.clip(np.asarray(sample_fn(p, noise, k_samp)), -1, 1)
        if is_main:
            save_image_grid(samples, savepath, nrow=math.ceil(math.sqrt(n)))

    def save_ckpt():
        ckpt_lib.save_checkpoint(os.path.join(exp_dir, "ckpt"), step, state)

    from dmtpu.utils.profiling import StepTimer

    logger.info("Start training...")
    gen = get_data_generator(loader)
    timer = StepTimer()
    pending = []
    run_start_step = step  # profiling windows are relative to THIS run (resume-safe)
    tracing = False
    while step < conf.train.n_steps:
        if args.profile and step - run_start_step == 10:
            jax.profiler.start_trace(args.profile)
            tracing = True
        batch = next(gen)
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        x = shard_batch(np.asarray(x, np.float32), mesh)
        rng = jax.random.fold_in(root_rng, step)
        state, metrics = train_step(state, x, rng)
        timer.tick()
        if tracing and step - run_start_step == 15:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            tracing = False
            logger.info(f"Wrote profiler trace to {args.profile}")
        # buffer device scalars; fetching every step would serialise on host
        # round-trips (the metrics sync is deferred to print_freq boundaries)
        # throughput is recorded at tick time so the flushed history keeps
        # the true per-step reading instead of flattening to the flush-time
        # value (advisor round-4 finding)
        pending.append((step, metrics, timer.throughput(conf.train.batch_size)))
        if check_freq(conf.train.print_freq, step) or check_freq(conf.train.save_freq, step) \
                or check_freq(conf.train.sample_freq, step) or step + 1 == conf.train.n_steps:
            for s_, m_, tput_ in pending:
                tracker.track_status(
                    "Train",
                    {"loss": m_["loss"], "grad_norm": m_["grad_norm"],
                     "lr": lr_at(s_),
                     "imgs_per_sec": tput_},
                    s_,
                )
            pending.clear()
        if check_freq(conf.train.save_freq, step):
            save_ckpt()
        if check_freq(conf.train.sample_freq, step):
            sample_and_save(os.path.join(exp_dir, "samples", f"step{step:0>6d}.png"),
                            jax.random.fold_in(root_rng, 2 ** 30 + step))
        step += 1
    if not check_freq(conf.train.save_freq, step - 1):
        step -= 1
        save_ckpt()
    tracker.close()
    if tracing:  # n_steps ended inside the profiling window — flush the trace
        jax.profiler.stop_trace()
        logger.info(f"Wrote profiler trace to {args.profile}")
    logger.info("End of training")


if __name__ == "__main__":
    main()
