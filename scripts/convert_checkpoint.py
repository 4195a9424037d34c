"""Convert upstream PyTorch checkpoints to native .npz parameter files.

Covers every zoo architecture (SURVEY.md §2b): this repo's UNets, pesser,
ADM (+combined), DiT, MDTv2, SD1.5/2.1, SDXL.  The output .npz loads
instantly in the sampling CLIs (``--weights foo.npz``).

Usage:
    python scripts/convert_checkpoint.py -c weights/<...>.yaml \
        --weights /path/to/upstream.(pt|ckpt|safetensors) --out foo.npz
        [--vae-weights VAE.bin] [--text-encoder-weights TE.bin]
"""
import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.convert import convert_by_structure, load_torch_weights  # noqa: E402
from dmtpu.utils.config import instantiate_from_config, load_config  # noqa: E402
from dmtpu.utils.logger import get_logger  # noqa: E402


def extract_clip_tower(sd, name: str):
    """``text_encoders.<name>.*`` -> (flax CLIPTextTransformer params, cfg).

    Layout auto-detected (HF ``text_model.`` or open_clip ``resblocks.``
    fused-in_proj — the two sub-layouts seen in single-file releases);
    tower dimensions are INFERRED from the tensors so any size converts.
    Returns None when the checkpoint carries no such tower.
    """
    from dmtpu.convert.sd import (_strip, hf_clip_text_strip,
                                  openclip_text_to_hf)
    from dmtpu.models.stablediffusion.text_encoders import CLIPTextTransformer

    tower = _strip(sd, f"text_encoders.{name}.")
    if not tower:
        return None
    if any(".resblocks." in k for k in tower):
        # open_clip layout: resblocks live under transformer.* but the
        # embeddings/ln_final/text_projection are TOP-level — the rewriter
        # handles both, so no prefix strip here
        tower = openclip_text_to_hf(tower)
    else:
        if any(k.startswith("transformer.") for k in tower):
            tower = _strip(tower, "transformer.")
        tower = hf_clip_text_strip(tower)
    if "text_projection.weight" in tower:  # HF-with-projection: [proj, width]
        tower["text_projection"] = np.asarray(
            tower.pop("text_projection.weight")).T
    emb = tower["embeddings.token_embedding.weight"]
    layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                     for k in tower if k.startswith("encoder.layers."))
    width = int(emb.shape[1])
    cfg = dict(width=width, layers=layers, vocab_size=int(emb.shape[0]),
               heads=max(1, width // 64),
               act="quick_gelu" if name == "clip_l" else "gelu")
    if "text_projection" in tower:
        cfg["projection_dim"] = int(np.shape(tower["text_projection"])[-1])
    max_length = int(tower["embeddings.position_embedding.weight"].shape[0])
    model = CLIPTextTransformer(max_length=max_length, **cfg)
    init = jax.eval_shape(
        lambda r, ids: model.init(r, ids, output_layer="penultimate-nonorm",
                                  return_pooled=True),
        jax.random.PRNGKey(0), jnp.zeros((1, max_length), jnp.int32))
    return convert_by_structure(tower, init), dict(cfg, max_length=max_length)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True,
                   help="reference-format weight yaml (model + diffusion)")
    p.add_argument("--weights", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--vae-weights", default=None)
    p.add_argument("--text-encoder-weights", default=None)
    p.add_argument("--uncond-weights", default=None,
                   help="second (unconditional) ADM checkpoint: fuses both "
                        "into one UNetCombined tree (reference: "
                        "models/adm/unet_combined.py:27 combine_weights)")
    args = p.parse_args()
    logger = get_logger()

    conf = load_config(args.config)
    model = instantiate_from_config(conf.model)
    sd = load_torch_weights(args.weights)
    logger.info(f"Loaded {len(sd)} tensors from {args.weights}")

    target = conf.model.target
    if "stablediffusion.stablediffusion" in target or "sdxl.stablediffusion" in target:
        te_sd = load_torch_weights(args.text_encoder_weights) if args.text_encoder_weights else None
        params = model.load_state_dict(sd, te_sd)
    elif "dit.dit" in target or "mdt.mdt" in target:
        vae_sd = load_torch_weights(args.vae_weights) if args.vae_weights else None
        params = model.load_state_dict(sd, vae_sd)
    elif "mmdit" in target.lower():
        from dmtpu.convert.zoo import convert_mmdit

        img_size = conf.get("data", {}).get("params", {}).get(
            "img_size", conf.model.params.get("input_size", 32))
        ch = conf.model.params.get("in_channels", 4)
        x = jnp.zeros((1, img_size, img_size, ch))
        y = {"context": jnp.zeros((1, 1, conf.model.params.context_dim)),
             "pooled": jnp.zeros((1, conf.model.params.pooled_dim))}
        init = jax.eval_shape(model.init, jax.random.PRNGKey(0), x,
                              jnp.zeros((1,)), y)
        params = convert_mmdit(sd, init)
        # the single-file SD3 release bundles the 16-channel VAE under
        # first_stage_model.*; extract it to <out>_vae.npz so
        # sample_mmdit --vae_weights can decode (same structural path as
        # dmtpu/convert/sd.py uses for SD1.5's first_stage_model)
        if conf.get("vae") and any(k.startswith("first_stage_model.")
                                   for k in sd):
            from dmtpu.convert.sd import _strip

            vae = instantiate_from_config(conf.vae)
            vae_init = jax.eval_shape(
                vae.init, jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, vae.in_channels)),
                jax.random.PRNGKey(1))  # posterior-sample rng
            vae_params = convert_by_structure(
                _strip(sd, "first_stage_model."), vae_init)
            vout = os.path.splitext(args.out)[0] + "_vae.npz"
            np.savez(vout, params=np.asarray(
                jax.tree.map(lambda a: np.asarray(a), vae_params),
                dtype=object))
            nv = sum(int(np.prod(np.shape(a)))
                     for a in jax.tree.leaves(vae_params))
            logger.info(f"Wrote {vout}: {nv / 1e6:.1f}M VAE params")
        # 'incl_clips' SD3 release variants also bundle the CLIP towers
        # under text_encoders.{clip_l,clip_g}.* — extract them to the
        # tower .npz files scripts/encode_prompts.py consumes.  (T5-XXL is
        # not extracted: FrozenT5Embedder loads HF checkpoint DIRS.)
        for tname in ("clip_l", "clip_g"):
            res = extract_clip_tower(sd, tname)
            if res is None:
                continue
            t_params, t_cfg = res
            tout = os.path.splitext(args.out)[0] + f"_{tname}.npz"
            np.savez(tout,
                     params=np.asarray(jax.tree.map(np.asarray, t_params),
                                       dtype=object),
                     config=json.dumps(t_cfg))
            logger.info(f"Wrote {tout} ({t_cfg})")
    elif args.uncond_weights is not None:
        from dmtpu.convert.zoo import combine_adm_weights

        uncond_sd = load_torch_weights(args.uncond_weights)
        img_size = conf.get("data", {}).get("params", {}).get("img_size", 64)
        ch = conf.get("data", {}).get("img_channels", 3)
        x = jnp.zeros((1, img_size, img_size, ch))
        t = jnp.zeros((1,), jnp.int32)
        init = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t,
                              jnp.zeros((1,), jnp.int32))
        params = combine_adm_weights(sd, uncond_sd, init)
    else:
        # plain flax module: structural conversion against init shapes
        img_size = conf.get("data", {}).get("params", {}).get("img_size", 32)
        ch = conf.get("data", {}).get("img_channels", 3)
        x = jnp.zeros((1, img_size, img_size, ch))
        t = jnp.zeros((1,), jnp.int32)
        try:
            init = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
        except Exception:
            init = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t,
                                  jnp.zeros((1,), jnp.int32))
        params = convert_by_structure(sd, init)

    np.savez(args.out, params=np.asarray(
        jax.tree.map(lambda a: np.asarray(a), params), dtype=object))
    n = sum(int(np.prod(np.shape(a))) for a in jax.tree.leaves(params))
    logger.info(f"Wrote {args.out}: {n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
