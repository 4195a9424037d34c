"""Stable Diffusion text-to-image CLI — the full serving stack, headless.

The reference serves SD only through its streamlit UI (reference:
streamlit/pages/3_Stable_Diffusion.py); this CLI exposes the same pipeline
plus every dmtpu serving accelerator so the stack is drivable on a chip
without a browser:

- samplers: ddim / ddpm / dpmpp / pfdiff (CFG variants, one 2B-batched call)
- ``--guidance_interval T_LO T_HI``: limited-interval CFG (ddim/ddpm)
- ``--tome_ratio``: ToMe token merging (dmtpu/ops/tome.py)
- ``--freeu``: FreeU backbone/skip re-weighting (paper SD1.5 scales)
- ``--deepcache INTERVAL SKIP``: cached-UNet serving (ddim; the CFG combine
  moves inside the full/shallow callables so the cache carries both halves)

Weights: a CompVis ``.ckpt``/``.safetensors`` or merged-LoRA ``.npz`` via
``--weights``; without it the pipeline runs with random-init params (demo
mode — wiring/performance only).  Prompts tokenize with a local
CLIPTokenizer (``DMTPU_CLIP_TOKENIZER``); demo mode falls back to
deterministic pseudo-token ids so the CLI stays runnable in a zero-egress
image.
"""
import argparse
import hashlib
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.diffusions import DDIM, DDIMCFG, DDPMCFG, DPMSolverPPCFG, PFDiffDDIMCFG  # noqa: E402
from dmtpu.diffusions.deepcache import deepcache_sample  # noqa: E402
from dmtpu.utils.config import instantiate_from_config, load_config  # noqa: E402
from dmtpu.utils.image import to_pil  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402

_SAMPLERS = {"ddim": DDIMCFG, "ddpm": DDPMCFG, "dpmpp": DPMSolverPPCFG,
             "pfdiff": PFDiffDDIMCFG}


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-c", "--config", type=str, required=True,
                   help="SD weight yaml (reference weights/stablediffusion/*.yaml)")
    p.add_argument("--weights", type=str, default=None,
                   help=".ckpt/.safetensors/.npz; omit for random-init demo mode")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative", type=str, default="")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=sorted(_SAMPLERS))
    p.add_argument("--respace_type", type=str, default="uniform")
    p.add_argument("--respace_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--guidance_interval", type=float, nargs=2, default=None,
                   metavar=("T_LO", "T_HI"))
    p.add_argument("--tome_ratio", type=float, default=0.0)
    p.add_argument("--tome_max_downsample", type=int, default=1,
                   help="merge at levels with ds <= this (2 for SDXL-style "
                        "UNets whose finest attention level is ds=2)")
    p.add_argument("--freeu", type=str, nargs="?", const="sd15", default=None,
                   choices=["sd15", "sd21", "sdxl"],
                   help="enable FreeU with a model-family preset "
                        "(bare --freeu = sd15 paper scales)")
    p.add_argument("--freeu_scales", type=float, nargs=4, default=None,
                   metavar=("B1", "B2", "S1", "S2"),
                   help="explicit FreeU scales (overrides --freeu preset)")
    p.add_argument("--deepcache", type=int, nargs=2, default=None,
                   metavar=("INTERVAL", "SKIP"))
    p.add_argument("--init_image", type=str, default=None,
                   help="img2img (SDEdit in latent space): encode this image, "
                        "diffuse to strength*steps, run the reverse tail")
    p.add_argument("--strength", type=float, default=0.75,
                   help="img2img noising fraction in (0, 1]: 1.0 = full noise")
    p.add_argument("--inpaint_image", type=str, default=None,
                   help="latent inpainting: keep this image where the mask "
                        "is white, regenerate the rest (ddim only)")
    p.add_argument("--inpaint_mask", type=str, default=None,
                   help="mask image (white/>=128 = keep); downsampled to the "
                        "latent grid")
    args = p.parse_args()
    if (args.inpaint_image is None) != (args.inpaint_mask is None):
        p.error("--inpaint_image and --inpaint_mask go together")
    if args.inpaint_image is not None:
        if args.sampler != "ddim":
            p.error("--inpaint_image supports the ddim sampler")
        if args.deepcache is not None or args.init_image is not None:
            p.error("--inpaint_image composes with neither --deepcache nor "
                    "--init_image")
    if args.init_image is not None:
        if args.sampler == "pfdiff":
            p.error("--init_image needs a start_step sampler (ddim/ddpm/dpmpp)")
        if args.deepcache is not None:
            p.error("--init_image and --deepcache are not composed yet")
        if not 0.0 < args.strength <= 1.0:
            p.error("--strength must be in (0, 1]")
    if args.deepcache is not None and args.sampler not in ("ddim", "pfdiff"):
        p.error("--deepcache composes with the ddim/pfdiff samplers")
    if args.deepcache is not None and args.guidance_interval is not None:
        p.error("--deepcache and --guidance_interval are not composed yet")
    if args.guidance_interval is not None and args.sampler not in ("ddim", "ddpm"):
        p.error("--guidance_interval supports the ddpm/ddim samplers")
    return args


def _demo_token_ids(text: str, max_length: int, vocab: int) -> np.ndarray:
    """Deterministic pseudo-tokens for demo mode (no local CLIPTokenizer):
    stable per-prompt ids so repeated runs and cond/uncond branches are
    reproducible.  NOT a real tokenization."""
    h = hashlib.sha256(text.encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    ids = rng.randint(3, vocab - 1, size=(max_length,))
    ids[0], ids[-1] = 0, 2  # BOS/EOS-ish anchors
    return ids[None]


def _load_image_batch(path: str, width: int, height: int, batch: int):
    """PNG/JPEG -> [-1, 1] float32 NHWC, tiled to the batch size."""
    from PIL import Image

    im = Image.open(path).convert("RGB").resize((width, height), Image.LANCZOS)
    arr = np.asarray(im, np.float32) / 127.5 - 1.0
    return jnp.tile(jnp.asarray(arr)[None], (batch, 1, 1, 1))


def encode_prompt(sd, params, text: str, batch: int, real_weights: bool):
    te = sd.text_encoder
    tok = os.environ.get("DMTPU_CLIP_TOKENIZER")
    if tok and getattr(te, "tokenizer", None) is None:
        from transformers import CLIPTokenizer

        te.tokenizer = CLIPTokenizer.from_pretrained(tok)
    if getattr(te, "tokenizer", None) is not None:
        ids = np.asarray(te.tokenize([text]))
    else:
        if real_weights:
            # pseudo-tokens + real weights would silently produce garbage
            # images indistinguishable from a weights problem
            raise SystemExit(
                "--weights given but no tokenizer available: set "
                "DMTPU_CLIP_TOKENIZER to a local CLIPTokenizer directory "
                "(demo pseudo-tokens are only allowed with random init)")
        vocab = getattr(te.model, "vocab_size", 49408)
        ids = _demo_token_ids(text, getattr(te, "max_length", 77), vocab)
    emb = sd.text_encoder_encode_tokens(params, jnp.asarray(ids))
    return jnp.tile(emb, (batch, 1, 1))


def main():
    args = parse_args()
    logger = get_logger()
    conf = load_config(args.config)
    sd = instantiate_from_config(conf.model)
    if args.weights:
        params = sd.load_weights(args.weights)
        logger.info(f"loaded weights: {args.weights}")
    else:
        logger.warning("no --weights: RANDOM init (demo mode)")
        params = sd.init_params(jax.random.PRNGKey(0), img_size=args.height)

    # serving accelerators: rebind the UNet (params unchanged)
    if args.tome_ratio > 0:
        sd.set_tome(args.tome_ratio, max_downsample=args.tome_max_downsample)
    if args.freeu_scales is not None or args.freeu is not None:
        from dmtpu.ops import freeu as freeu_lib

        presets = {"sd15": freeu_lib.SD15_DEFAULTS,
                   "sd21": freeu_lib.SD21_DEFAULTS,
                   "sdxl": freeu_lib.SDXL_DEFAULTS}
        sd.set_freeu(args.freeu_scales or presets[args.freeu or "sd15"])

    dp = dict(conf.diffusion.get("params", {}))
    dp.pop("device", None)
    if args.sampler != "ddpm":
        dp.pop("var_type", None)
    dp.update(respace_type=args.respace_type, respace_steps=args.respace_steps)

    ce = encode_prompt(sd, params, args.prompt, args.batch_size,
                       real_weights=bool(args.weights))
    ue = encode_prompt(sd, params, args.negative, args.batch_size,
                       real_weights=bool(args.weights))
    s = args.guidance_scale
    lat_h, lat_w = args.height // 8, args.width // 8

    from _common import DataParallelSampler

    # DP-shard like every other sampling CLI: params replicated once, the
    # per-batch (noise, cond, uncond) sharded on the leading axis
    dp_s = DataParallelSampler(params)

    if args.deepcache is not None:
        interval, skip = args.deepcache
        pfdiff_dc = args.sampler == "pfdiff"
        from dmtpu.diffusions import PFDiffDDIM
        from dmtpu.diffusions.deepcache import pfdiff_deepcache_sample

        diffuser = (PFDiffDDIM if pfdiff_dc else DDIM)(**dp)

        # one 2B-batched call per step; the cache carries both halves, and
        # the CFG combine happens in the loop's postprocess/eps_fn seam WITH
        # the tape row in hand — per-branch predict (so clip_denoised clips
        # each branch exactly like DDPMCFG), then the (1-s)/s eps combine.
        # interval=1 is trajectory-exact vs DDIMCFG/PFDiffDDIMCFG (tested).
        def cfg_combine(out2, xc, c):
            oc, ou = jnp.split(out2, 2, axis=0)
            eps_c = diffuser.predict(oc, xc, c)["pred_eps"]
            eps_u = diffuser.predict(ou, xc, c)["pred_eps"]
            return (1.0 - s) * eps_u + s * eps_c

        @jax.jit
        def sample_fn(p, noise, ce, ue, key):
            def raw_out(x, t, dc_kw):
                return sd.unet.apply(
                    p["unet"], jnp.concatenate([x, x]), jnp.concatenate([t, t]),
                    context=jnp.concatenate([ce, ue]), **dc_kw)

            def full_fn(x, t):
                return raw_out(x, t, dict(dc_skip=skip))

            def shallow_fn(x, t, u):
                # the cache comes from the 2B full pass, so it is already
                # sized for the doubled batch
                return raw_out(x, t, dict(dc_skip=skip, dc_cached=u))[0]

            if pfdiff_dc:
                del key  # PFDiff is deterministic
                return pfdiff_deepcache_sample(diffuser, full_fn, shallow_fn,
                                               noise, interval=interval,
                                               eps_fn=cfg_combine)
            return deepcache_sample(diffuser, full_fn, shallow_fn, noise, key,
                                    interval=interval,
                                    postprocess=cfg_combine)
    else:
        extra = dict(guidance_scale=s, cond_kwarg="text_embed")
        if args.guidance_interval is not None:
            extra["guidance_interval"] = tuple(args.guidance_interval)
        if args.inpaint_image is not None:
            # latent inpainting: MaskGuidance x DDIMCFG cooperative MRO —
            # per-step known-region overwrite rides the guidance hook in
            # the same compiled scan (dmtpu/diffusions/guidance)
            from PIL import Image

            from dmtpu.diffusions.guidance import MaskGuidanceDDIMCFG

            img_b = _load_image_batch(args.inpaint_image, args.width,
                                      args.height, args.batch_size)
            mk = Image.open(args.inpaint_mask).convert("L").resize(
                (lat_w, lat_h), Image.NEAREST)
            lat_mask = (np.asarray(mk, np.float32) >= 128.0).astype(np.float32)
            lat_mask = jnp.tile(jnp.asarray(lat_mask)[None, :, :, None],
                                (args.batch_size, 1, 1, 1))
            diffuser = MaskGuidanceDDIMCFG(**dp, **extra)
            z_known = sd.encode_latent(params, img_b,
                                       jax.random.PRNGKey(args.seed + 1))
            # the guidance state must match the PADDED DP batch the jitted
            # sampler sees (pad_shard wraps rows to a device-count multiple)
            (z_known, lat_mask), _ = dp_s.pad_shard((z_known, lat_mask))
            diffuser.set_mask_and_image(z_known, lat_mask)
        else:
            diffuser = _SAMPLERS[args.sampler](**dp, **extra)

        if args.init_image is not None:
            # img2img: encode -> q-diffuse to the strength point -> run the
            # tail of the reverse tape (the sample_sdedit.py pattern, in
            # latent space)
            S = len(diffuser.respaced_seq)
            edit_steps = max(1, min(S, round(args.strength * S)))
            t_edit = int(diffuser.respaced_seq[edit_steps - 1])
            start_row = S - edit_steps

            @jax.jit
            def sample_fn(p, noise, z0, ce, ue, key):
                def model_fn(x, t, text_embed=None, **kw):
                    return sd.unet.apply(p["unet"], x, t, context=text_embed)

                xt = diffuser.diffuse(
                    z0, jnp.full((z0.shape[0],), t_edit, jnp.int32), noise)
                return diffuser.sample(model_fn, xt, key,
                                       uncond_conditioning=ue,
                                       model_kwargs=dict(text_embed=ce),
                                       start_step=start_row)
        else:
            @jax.jit
            def sample_fn(p, noise, ce, ue, key):
                def model_fn(x, t, text_embed=None, **kw):
                    return sd.unet.apply(p["unet"], x, t, context=text_embed)

                return diffuser.sample(model_fn, noise, key,
                                       uncond_conditioning=ue,
                                       model_kwargs=dict(text_embed=ce))

    init_lat = None
    if args.init_image is not None:
        # encode ONCE (the init image is constant across batches) instead of
        # re-running the VAE encoder inside every jitted sampler call
        img_b = _load_image_batch(args.init_image, args.width, args.height,
                                  args.batch_size)
        init_lat = sd.encode_latent(params, img_b,
                                    jax.random.PRNGKey(args.seed + 2))

    os.makedirs(args.save_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    done = 0
    batch_i = 0
    while done < args.n_samples:
        k = jax.random.fold_in(rng, batch_i)
        k_noise, k_samp = jax.random.split(k)
        noise = jax.random.normal(k_noise, (args.batch_size, lat_h, lat_w, 4))
        if init_lat is not None:
            (noise_s, z0_s, ce_s, ue_s), true_b = dp_s.pad_shard(
                (noise, init_lat, ce, ue))
            z = sample_fn(dp_s.params, noise_s, z0_s, ce_s, ue_s, k_samp)[:true_b]
        else:
            (noise_s, ce_s, ue_s), true_b = dp_s.pad_shard((noise, ce, ue))
            z = sample_fn(dp_s.params, noise_s, ce_s, ue_s, k_samp)[:true_b]
        imgs = np.clip(np.asarray(sd.decode_latent(dp_s.params, z)), -1, 1)
        for b in range(min(true_b, args.n_samples - done)):
            to_pil(imgs[b]).save(os.path.join(args.save_dir, f"{done + b}.png"))
        done += min(true_b, args.n_samples - done)
        batch_i += 1
        logger.info(f"saved {done}/{args.n_samples}")


if __name__ == "__main__":
    main()
