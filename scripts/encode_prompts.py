"""Cache SD3/MMDiT text conditioning to the .npz ``sample_mmdit`` consumes.

The MMDiT serving CLI samples from CACHED embeddings (``--embeddings
emb.npz`` with ``context [N, L, Dc]`` / ``pooled [N, Dp]`` rows); this tool
produces that file from prompt strings — the missing prompt->image link.

SD3 conditioning recipe (public SD3 release; the assembly mirrors SDXL's
dual-tower pattern already used in dmtpu/models/sdxl.py:91-108):

  clip_l : CLIP ViT-L       penultimate (no final LN) hidden [77,  768]
                            + pooled (EOT token, final-LN)          768
  clip_g : open_clip bigG   penultimate-nonorm hidden       [77, 1280]
                            + projected pooled                     1280
  t5     : T5-XXL encoder   last hidden                     [77, 4096]
                            (zeros with --no_t5 — the release's
                            documented T5-less serving mode)

  context = concat_tokens( zero_pad_width( concat_width(l, g) ), t5 )
            -> [154, 4096]
  pooled  = concat(l_pooled, g_pooled) -> [2048]

Two modes:
  demo  (default, no tower weights): deterministic pseudo-embeddings per
        prompt — byte-identical to ``sample_mmdit --prompt`` demo rows, so
        cached-demo and inline-demo sampling agree.  Shapes come from
        --context_len/--context_dim/--pooled_dim.
  real  (--clip_l_weights/--clip_g_weights .npz + --t5_dir|--no_t5 +
        --clip_tokenizer): run the towers.  Tower .npz files come from
        scripts/convert_checkpoint.py against the HF/open_clip releases.

Usage:
    python scripts/encode_prompts.py --out emb.npz \
        --prompts "a cat" "a dog"                      # demo shapes 154/4096/2048
    python scripts/encode_prompts.py --out emb.npz --prompts "a cat" \
        --clip_l_weights l.npz --clip_g_weights g.npz --no_t5 \
        --clip_tokenizer /path/to/local/clip-tokenizer
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

from dmtpu.utils.logger import get_logger  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--prompts", nargs="+", default=None)
    p.add_argument("--prompts_file", type=str, default=None,
                   help="one prompt per line (mutually additive with --prompts)")
    p.add_argument("--include_uncond", action="store_true",
                   help="append one all-zeros row (the CFG null — identical "
                        "to MMDiT.null_conditioning / training dropout)")
    # demo-mode shapes (defaults = configs/sd3_medium.yaml)
    p.add_argument("--context_len", type=int, default=154)
    p.add_argument("--context_dim", type=int, default=4096)
    p.add_argument("--pooled_dim", type=int, default=2048)
    # real towers
    p.add_argument("--clip_l_weights", type=str, default=None)
    p.add_argument("--clip_g_weights", type=str, default=None)
    p.add_argument("--t5_dir", type=str, default=None,
                   help="local HF T5 encoder checkpoint+tokenizer dir")
    p.add_argument("--no_t5", action="store_true",
                   help="zero-fill the T5 half of the context (T5-less "
                        "serving, supported by the SD3 release)")
    p.add_argument("--clip_tokenizer", type=str,
                   default=os.environ.get("DMTPU_CLIP_TOKENIZER"),
                   help="local CLIPTokenizer dir (both CLIP towers share "
                        "the BPE vocab)")
    p.add_argument("--max_length", type=int, default=77)
    return p


def demo_rows(prompts, context_len: int, context_dim: int, pooled_dim: int):
    """Deterministic pseudo-embeddings, byte-identical to sample_mmdit's
    --prompt demo branch (same sha256 seed derivation)."""
    ctx, pool = [], []
    for text in prompts:
        digest = hashlib.sha256(f"dmtpu-mmdit:{text}".encode()).digest()
        rs = np.random.RandomState(int.from_bytes(digest[:4], "little"))
        ctx.append(rs.randn(context_len, context_dim).astype(np.float32))
        pool.append(rs.randn(pooled_dim).astype(np.float32))
    return np.stack(ctx), np.stack(pool)


def assemble_sd3(l_hidden, l_pooled, g_hidden, g_pooled, t5_hidden):
    """The SD3 context/pooled assembly (pure; shapes [B, T, *]/[B, *]).

    CLIP halves concat on width, zero-pad to the T5 width, then the T5
    tokens append on the sequence axis; pooled is the L|G concat.
    """
    clip = jnp.concatenate([l_hidden, g_hidden], axis=-1)
    wt = t5_hidden.shape[-1]
    if clip.shape[-1] > wt:
        raise ValueError(f"CLIP joint width {clip.shape[-1]} exceeds the "
                         f"T5/context width {wt}")
    clip = jnp.pad(clip, ((0, 0), (0, 0), (0, wt - clip.shape[-1])))
    context = jnp.concatenate([clip, t5_hidden], axis=1)
    pooled = jnp.concatenate([l_pooled, g_pooled], axis=-1)
    return context, pooled


def build_towers(args):
    """(clip_l, clip_g, t5_embedder_or_None) — separated for test injection."""
    from dmtpu.models.stablediffusion.text_encoders import (
        FrozenCLIPEmbedder, FrozenOpenCLIPEmbedder, FrozenT5Embedder)

    clip_l = FrozenCLIPEmbedder("clip-vit-l", max_length=args.max_length)
    clip_g = FrozenOpenCLIPEmbedder("open-clip-vit-bigg",
                                    max_length=args.max_length)
    t5 = None
    if not args.no_t5:
        t5 = FrozenT5Embedder(args.t5_dir, max_length=args.max_length)
    return clip_l, clip_g, t5


def encode_real(prompts, clip_l, clip_g, t5, l_params, g_params,
                context_dim=None):
    """Run the towers and assemble; ``t5=None`` zero-fills the T5 half at
    ``context_dim`` width (required in that case)."""
    l_ids = jnp.asarray(clip_l.tokenize(prompts))
    g_ids = jnp.asarray(clip_g.tokenize(prompts))
    # penultimate-nonorm hidden + pooled: the SDXL-established call shape
    # (dmtpu/models/sdxl.py:108); bigG's pooled goes through text_projection
    l_h, l_p = clip_l.model.apply(l_params, l_ids,
                                  output_layer="penultimate-nonorm",
                                  return_pooled=True)
    g_h, g_p = clip_g.model.apply(g_params, g_ids,
                                  output_layer="penultimate-nonorm",
                                  return_pooled=True)
    if t5 is not None:
        t5_h = t5.encode(prompts)
    else:
        if context_dim is None:
            raise ValueError("--no_t5 needs --context_dim for the zero fill")
        t5_h = jnp.zeros((l_h.shape[0], l_h.shape[1], context_dim), l_h.dtype)
    return assemble_sd3(l_h, l_p, g_h, g_p, t5_h)


def _load_npz_params(path):
    data = dict(np.load(path, allow_pickle=True))
    return jax.tree.map(jnp.asarray, data["params"].item())


def load_tower(path, fallback_cfg: str, max_length: int):
    """Tower .npz -> (CLIPTextTransformer, params).  convert_checkpoint's
    extraction embeds the inferred tower config (width/layers/projection);
    fall back to the named preset for hand-built npz files."""
    import json

    from dmtpu.models.stablediffusion.text_encoders import (
        CLIP_TEXT_CONFIGS, CLIPTextTransformer)

    data = dict(np.load(path, allow_pickle=True))
    params = jax.tree.map(jnp.asarray, data["params"].item())
    if "config" in data:
        cfg = json.loads(str(data["config"]))
        ml = cfg.pop("max_length", max_length)
    else:
        cfg, ml = dict(CLIP_TEXT_CONFIGS[fallback_cfg]), max_length
    return CLIPTextTransformer(max_length=ml, **cfg), params


def main():
    args = get_parser().parse_args()
    logger = get_logger()
    prompts = list(args.prompts or [])
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts += [ln.rstrip("\n") for ln in f if ln.strip()]
    if not prompts:
        raise SystemExit("no prompts: pass --prompts and/or --prompts_file")

    real = args.clip_l_weights or args.clip_g_weights
    if real:
        if not (args.clip_l_weights and args.clip_g_weights):
            raise SystemExit("real mode needs BOTH --clip_l_weights and "
                             "--clip_g_weights")
        if not args.t5_dir and not args.no_t5:
            raise SystemExit("real mode needs --t5_dir or --no_t5")
        if not args.clip_tokenizer:
            raise SystemExit("real mode needs --clip_tokenizer (local "
                             "CLIPTokenizer dir; DMTPU_CLIP_TOKENIZER works)")
        from transformers import CLIPTokenizer

        clip_l, clip_g, t5 = build_towers(args)
        clip_l.tokenizer = clip_g.tokenizer = \
            CLIPTokenizer.from_pretrained(args.clip_tokenizer)
        # honor the tower config convert_checkpoint embedded (a projected
        # clip_l / non-preset width would otherwise shape-mismatch)
        clip_l.model, l_params = load_tower(args.clip_l_weights, "clip-vit-l",
                                            args.max_length)
        clip_g.model, g_params = load_tower(args.clip_g_weights,
                                            "open-clip-vit-bigg",
                                            args.max_length)
        clip_l.max_length = clip_l.model.max_length
        clip_g.max_length = clip_g.model.max_length
        ctx, pool = encode_real(prompts, clip_l, clip_g, t5, l_params,
                                g_params, context_dim=args.context_dim)
        ctx, pool = np.asarray(ctx, np.float32), np.asarray(pool, np.float32)
        logger.info(f"encoded {len(prompts)} prompt(s) through the towers"
                    + (" (T5 zero-filled)" if t5 is None else ""))
    else:
        ctx, pool = demo_rows(prompts, args.context_len, args.context_dim,
                              args.pooled_dim)
        logger.warning("no tower weights: DEMO pseudo-embeddings (match "
                       "sample_mmdit --prompt rows)")

    if args.include_uncond:
        ctx = np.concatenate([ctx, np.zeros_like(ctx[:1])])
        pool = np.concatenate([pool, np.zeros_like(pool[:1])])
    np.savez(args.out, context=ctx, pooled=pool)
    logger.info(f"Wrote {args.out}: context {ctx.shape}, pooled {pool.shape}")


if __name__ == "__main__":
    main()
