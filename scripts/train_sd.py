"""Latent text-to-image fine-tuning for Stable Diffusion (beyond parity).

The reference trains pixel-space DDPMs only (reference: scripts/
train_ddpm.py:42-249); this script brings the same compiled-train-step
design to SD-style latent diffusion: frozen VAE + frozen CLIP text tower +
trainable UNet, all THREE towers inside ONE jitted step (online latent
encode + text encode + eps-loss + optimizer + EMA), mesh-sharded over
(data, fsdp).  Single-chip SD1.5 512² fine-tuning fits via the adafactor
default (docs/ROADMAP.md "Training throughput": f32 Adam moments alone
would be 6.9 GB).

Usage:
    python scripts/train_sd.py -c configs/sd_finetune.yaml [-e EXP_DIR]
        [-r best|latest|PATH] [-ni] [key.sub=value ...]

Config additions over train_ddpm.py:
    weights:   optional CompVis .ckpt/.safetensors to fine-tune from
               (omitted -> random init, demo/testing)
    tokenizer: local CLIPTokenizer path (omitted if the text encoder
               already has one injected)
    train.p_uncond: caption-dropout prob for CFG fine-tuning (in-graph)
    train.lora: {rank, alpha?, targets?} -> LoRA fine-tuning: the UNet
               joins the frozen towers and only the low-rank adapters
               train (dmtpu/models/lora.py); checkpoints hold just the
               adapter tree (~MBs)
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

from dmtpu.diffusions import DDIMCFG  # noqa: E402
from dmtpu.parallel import (  # noqa: E402
    TrainState,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from dmtpu.parallel.mesh import replicated_sharding  # noqa: E402
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

    # DATA (captioned)
    if conf.train.batch_size % jax.process_count() != 0:
        raise ValueError("Batch size must be divisible by process count")
    per_host_bs = conf.train.batch_size // jax.process_count()
    micro_batch = conf.train.get("micro_batch", 0) or per_host_bs
    micro_batches = max(1, per_host_bs // micro_batch)
    train_set = instantiate_from_config(conf.data)
    loader = __import__("dmtpu.data", fromlist=["DataLoader"]).DataLoader(
        train_set, batch_size=per_host_bs, shuffle=True, drop_last=True,
        seed=conf.get("seed", 0),
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        **conf.get("dataloader", {}),
    )
    logger.info(f"Size of training set: {len(train_set)}")

    # MODEL: SD wrapper; UNet trains, VAE + text encoder stay frozen
    sd = instantiate_from_config(conf.model)
    img_size = conf.data.params.img_size
    weights = conf.get("weights")
    if weights:
        params = sd.load_weights(weights)  # torch ckpt, or merged-LoRA .npz
        logger.info(f"Loaded SD weights from {weights}")
    else:
        params = sd.init_params(jax.random.PRNGKey(conf.get("seed", 0)), img_size)
        logger.info("No `weights:` in config -> RANDOM-INIT SD (demo/testing)")
    tok = sd.text_encoder.tokenizer
    if tok is None:
        from transformers import CLIPTokenizer

        tok_path = conf.get("tokenizer")
        if not tok_path:
            raise ValueError("config needs `tokenizer:` (local CLIPTokenizer path) "
                             "unless the text encoder has one injected")
        tok = CLIPTokenizer.from_pretrained(tok_path)
        sd.text_encoder.tokenizer = tok

    lora_conf = conf.train.get("lora")
    if lora_conf:
        from dmtpu.models.lora import (
            DEFAULT_TARGETS,
            apply_lora,
            init_lora,
            lora_param_count,
            lora_scale,
        )

        rank = int(lora_conf["rank"])
        scale = lora_scale(rank, lora_conf.get("alpha"))
        targets = tuple(lora_conf.get("targets", DEFAULT_TARGETS))
        trainable = init_lora(params["unet"], jax.random.PRNGKey(conf.get("seed", 0)),
                              rank=rank, targets=targets)
        logger.info(f"LoRA fine-tune: rank={rank} scale={scale:g} "
                    f"adapters={len(trainable)} "
                    f"({lora_param_count(trainable) / 1e6:.3f}M trainable; "
                    f"base UNet frozen)")

        def unet_params_of(train_p, frozen_p):
            return apply_lora(frozen_p["unet"], train_p, scale)
    else:
        trainable = params["unet"]

        def unet_params_of(train_p, frozen_p):
            return train_p

    max_len = getattr(sd.text_encoder, "max_length", 77)

    def tokenize(texts):
        return np.asarray(tok(list(texts), truncation=True, max_length=max_len,
                              padding="max_length", return_tensors="np")["input_ids"],
                          np.int32)

    empty_ids = jnp.asarray(tokenize([""]))  # [1, L] — broadcast per sample

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(trainable))
    logger.info(f"Trainable parameters: {n_params / 1e6:.2f}M")

    diffuser = instantiate_from_config(conf.diffusion)
    tx = instantiate_from_config(conf.train.optim)
    from dmtpu.utils.optim import lr_fn

    lr_at = lr_fn(conf.train.optim)
    p_uncond = float(conf.train.get("p_uncond", 0.0))

    def loss_fn(train_params, batch, rng, frozen):
        imgs, ids = batch["image"], batch["input_ids"]
        b = imgs.shape[0]
        k_enc, k_drop, k_t, k_eps, k_dropout = jax.random.split(rng, 5)
        unet_params = unet_params_of(train_params, frozen)
        z0 = sd.encode_latent({"vae": frozen["vae"]}, imgs, k_enc)
        if p_uncond > 0:
            drop = jax.random.bernoulli(k_drop, p_uncond, (b,))
            ids = jnp.where(drop[:, None], empty_ids, ids)
        text_embed = sd.text_encoder_encode_tokens(
            {"text_encoder": frozen["text_encoder"]}, ids)
        t = jax.random.randint(k_t, (b,), 0, conf.diffusion.params.total_steps)

        def model_fn(xt, tt, **kw):
            return sd.unet.apply(unet_params, xt, tt, text_embed,
                                 rngs={"dropout": k_dropout})

        return diffuser.loss_func(model_fn, z0, t, rng=k_eps)

    state = TrainState.create(trainable, tx, ema_decay=conf.train.ema_decay,
                              ema_gradual=conf.train.get("ema_gradual", True),
                              ema_dtype=conf.train.get("ema_dtype"))
    step = 0
    if args.resume is not None:
        path = find_resume_checkpoint(exp_dir, args.resume)
        state = ckpt_lib.load_checkpoint(path, state)
        step = int(state.step)
        logger.info(f"Resumed from {path} at step {step}")
    state = shard_train_state(state, mesh)
    frozen = {"vae": params["vae"], "text_encoder": params["text_encoder"]}
    if lora_conf:
        frozen["unet"] = params["unet"]
    frozen = jax.device_put(frozen, replicated_sharding(mesh))

    train_step = make_train_step(loss_fn, tx,
                                 clip_grad_norm=conf.train.clip_grad_norm,
                                 micro_batches=micro_batches, mesh=mesh,
                                 n_extra_args=1)

    # periodic CFG preview with the EMA UNet (compiled once)
    sample_scale = float(conf.train.get("sample_guidance_scale", 7.5))
    sample_steps = int(conf.train.get("sample_respace_steps", 50))
    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    dp.pop("var_type", None)
    dp.update(respace_type="uniform", respace_steps=sample_steps,
              guidance_scale=sample_scale, cond_kwarg="text_embed")
    preview = DDIMCFG(**dp)

    @jax.jit
    def sample_fn(train_p, fz, noise, key, ce, ue):
        unet_p = unet_params_of(train_p, fz)

        def model_fn(x, t, text_embed=None, **kw):
            return sd.unet.apply(unet_p, x, t, text_embed)

        z = preview.sample(model_fn, noise, key, uncond_conditioning=ue,
                           model_kwargs=dict(text_embed=ce))
        return sd.decode_latent({"vae": fz["vae"]}, z)

    sample_prompts = list(conf.train.get("sample_prompts", ["", ""]))

    def sample_and_save(savepath, key):
        p = state.ema.shadow if state.ema is not None else state.params
        n = len(sample_prompts)
        ce = sd.text_encoder_encode_tokens(
            {"text_encoder": frozen["text_encoder"]}, jnp.asarray(tokenize(sample_prompts)))
        ue = sd.text_encoder_encode_tokens(
            {"text_encoder": frozen["text_encoder"]}, jnp.tile(empty_ids, (n, 1)))
        k_noise, k_samp = jax.random.split(key)
        lat = img_size // 8
        noise = jax.random.normal(k_noise, (n, lat, lat, 4))
        imgs = np.clip(np.asarray(sample_fn(p, frozen, noise, k_samp, ce, ue)), -1, 1)
        if is_main:
            save_image_grid(imgs, savepath, nrow=math.ceil(math.sqrt(n)))

    def save_ckpt():
        ckpt_lib.save_checkpoint(os.path.join(exp_dir, "ckpt"), step, state)

    from dmtpu.utils.profiling import StepTimer

    logger.info("Start training...")
    gen = get_data_generator(loader)
    timer = StepTimer()
    pending = []
    while step < conf.train.n_steps:
        batch = next(gen)
        gbatch = shard_batch(
            {"image": np.asarray(batch["image"], np.float32),
             "input_ids": tokenize(batch["caption"])}, mesh)
        rng = jax.random.fold_in(root_rng, step)
        state, metrics = train_step(state, gbatch, rng, frozen)
        timer.tick()
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
                     "imgs_per_sec": tput_}, s_)
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
    logger.info("End of training")


if __name__ == "__main__":
    main()
