"""Class-conditional DDPM training with CFG label dropout.

(CLI parity: reference scripts/train_ddpm_cfg.py — label dropout with
probability ``train.p_uncond`` (:180-181, per-sample here), per-class eval
sampling with 20x respacing (:198-234).)
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

from dmtpu.diffusions import DDPMCFG  # noqa: E402
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
    parser.add_argument("-e", "--exp_dir", type=str)
    parser.add_argument("-r", "--resume", type=str)
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
    root_rng = jax.random.fold_in(jax.random.PRNGKey(conf.get("seed", 0)), jax.process_index())
    mesh = make_mesh()

    per_host_bs = conf.train.batch_size // jax.process_count()
    micro_batch = conf.train.micro_batch or per_host_bs
    micro_batches = max(1, per_host_bs // micro_batch)
    train_set = instantiate_from_config(conf.data)
    from dmtpu.data import DataLoader

    loader = DataLoader(train_set, batch_size=per_host_bs, shuffle=True, drop_last=True,
                        seed=conf.get("seed", 0),
                        num_shards=jax.process_count(), shard_index=jax.process_index(),
                        **conf.get("dataloader", {}))

    num_classes = conf.data.num_classes
    diffuser = instantiate_from_config(conf.diffusion)
    model = instantiate_from_config(conf.model)
    tx = instantiate_from_config(conf.train.optim)
    from dmtpu.utils.optim import lr_fn
    lr_at = lr_fn(conf.train.optim)
    img_size = conf.data.params.img_size
    img_ch = conf.data.img_channels

    params = jax.jit(model.init)(
        jax.random.PRNGKey(conf.get("seed", 0)),
        jnp.zeros((1, img_size, img_size, img_ch)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    logger.info(f"Model parameters: "
                f"{sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)) / 1e6:.2f}M")

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
        p_uncond=conf.train.p_uncond, null_label=num_classes,
    )
    train_step = make_train_step(loss_fn, tx, clip_grad_norm=conf.train.clip_grad_norm,
                                 micro_batches=micro_batches, mesh=mesh)

    # eval sampler: CFG with 20x respacing (reference :217)
    eval_diffuser = DDPMCFG(
        guidance_scale=1.0,
        **{**conf.diffusion.params.to_dict(),
           "respace_type": "uniform",
           "respace_steps": conf.diffusion.params.total_steps // 20},
    )

    @jax.jit
    def sample_fn(p, noise, key, y):
        def model_fn(x, t, y=None, **kw):
            return model.apply(p, x, t, y)

        return eval_diffuser.sample(
            model_fn, noise, key,
            uncond_conditioning=jnp.full((noise.shape[0],), num_classes, jnp.int32),
            model_kwargs=dict(y=y),
        )

    def sample_and_save(savepath, key):
        p = state.ema.shadow if state.ema is not None else state.params
        npc = conf.train.n_samples_each_class
        n_show = min(10, num_classes)
        y = jnp.repeat(jnp.arange(n_show), npc)
        k_noise, k_samp = jax.random.split(key)
        noise = jax.random.normal(k_noise, (n_show * npc, img_size, img_size, img_ch))
        out = np.clip(np.asarray(sample_fn(p, noise, k_samp, y)), -1, 1)
        if is_main:
            save_image_grid(out, savepath, nrow=npc)

    logger.info("Start training...")
    gen = get_data_generator(loader)
    pending = []
    while step < conf.train.n_steps:
        x, y = next(gen)
        batch = (shard_batch(np.asarray(x, np.float32), mesh),
                 shard_batch(np.asarray(y, np.int32), mesh))
        state, metrics = train_step(state, batch, jax.random.fold_in(root_rng, step))
        # defer the host metric sync to print_freq boundaries
        pending.append((step, metrics))
        if check_freq(conf.train.print_freq, step) or check_freq(conf.train.save_freq, step) \
                or check_freq(conf.train.sample_freq, step) or step + 1 == conf.train.n_steps:
            for s_, m_ in pending:
                tracker.track_status("Train", {"loss": m_["loss"],
                                               "grad_norm": m_["grad_norm"],
                                               "lr": lr_at(s_)}, s_)
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
