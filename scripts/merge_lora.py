"""Merge a trained LoRA adapter checkpoint into base SD weights for serving.

Completes the LoRA workflow (beyond reference parity — the reference
fine-tunes nothing): ``train_sd.py`` with ``train.lora`` saves a TrainState
whose ``params`` (and EMA shadow) are the ~MB adapter tree keyed by
dot-joined UNet param paths (dmtpu/models/lora.py).  This CLI loads the
base weights + that checkpoint, materialises ``W + (alpha/rank) * A @ B``
once, and writes a standalone ``.npz`` that every existing sampling
surface (CLIs, webui, streamlit) loads like any converted checkpoint.

Usage:
    python scripts/merge_lora.py -c configs/sd15_lora.yaml \
        --lora runs/exp-*/ckpt/step010000 [--base v1-5.ckpt] \
        --out merged.npz [--no-ema] [--scale S]

``--base`` overrides the config's ``weights:``; with neither, the model is
random-init (demo).  ``--scale`` overrides alpha/rank (e.g. 0.7 to damp
the adaptation).
"""
import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.models.lora import lora_scale, merge_lora  # noqa: E402
from dmtpu.utils import checkpoint as ckpt_lib  # noqa: E402
from dmtpu.utils.config import instantiate_from_config, load_config, merge_dotlist  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True,
                   help="the train_sd.py config the adapters were trained with")
    p.add_argument("--lora", type=str, required=True,
                   help="LoRA checkpoint dir (runs/<exp>/ckpt/stepNNNNNN)")
    p.add_argument("--base", type=str, default=None,
                   help="base SD weights (.ckpt/.safetensors); default: config `weights:`")
    p.add_argument("--out", type=str, required=True, help="output .npz path")
    p.add_argument("--no-ema", action="store_true",
                   help="merge the raw adapters instead of their EMA shadow")
    p.add_argument("--scale", type=float, default=None,
                   help="override the merge scale (default alpha/rank from config)")
    return p


def main():
    args, unknown = get_parser().parse_known_args()
    conf = merge_dotlist(load_config(args.config),
                         [a for a in unknown if "=" in a])
    logger = get_logger()

    lora_conf = conf.train.get("lora")
    if not lora_conf:
        raise ValueError("config has no train.lora block — nothing to merge")
    scale = (args.scale if args.scale is not None
             else lora_scale(int(lora_conf["rank"]), lora_conf.get("alpha")))

    sd = instantiate_from_config(conf.model)
    base = args.base or conf.get("weights")
    if base:
        # torch .ckpt/.safetensors, or an .npz (e.g. a previous merge output)
        params = sd.load_weights(base)
        logger.info(f"Loaded base weights from {base}")
    else:
        params = sd.init_params(jax.random.PRNGKey(conf.get("seed", 0)),
                                conf.data.params.img_size)
        logger.info("No base weights — RANDOM-INIT base (demo/testing)")

    restored = ckpt_lib.load_checkpoint_host(args.lora)
    which = "params" if args.no_ema else "ema"
    if args.no_ema:
        adapters = restored["params"]
    else:
        ema = restored.get("ema")
        if ema is None:
            which = "params (no EMA in checkpoint)"
            adapters = restored["params"]
        else:
            adapters = ema["shadow"]
    n = sum(int(np.asarray(v).size) for v in jax.tree.leaves(adapters))
    logger.info(f"Merging {which}: {len(adapters)} adapters "
                f"({n / 1e6:.3f}M params) at scale {scale:g}")

    params["unet"] = merge_lora(params["unet"], adapters, scale)
    np.savez(args.out, params=jax.device_get(params))
    logger.info(f"Wrote merged weights to {args.out}")


if __name__ == "__main__":
    main()
