"""scripts/encode_prompts.py: the prompt -> cached-embedding link for the
MMDiT/SD3 serving workflow (demo determinism, SD3 assembly layout, tiny
real-tower path, CLI e2e into sample_mmdit)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "scripts") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_demo_rows_match_sample_mmdit_pseudo():
    """Cached-demo rows must be byte-identical to sample_mmdit --prompt demo
    rows, so the two demo paths produce the same images."""
    import argparse

    import encode_prompts
    import sample_mmdit
    from dmtpu.utils.logger import get_logger

    ctx, pool = encode_prompts.demo_rows(["a cat"], 4, 8, 8)
    conf = argparse.Namespace(
        model=argparse.Namespace(params={"context_dim": 8, "pooled_dim": 8}),
        data=argparse.Namespace(params={"context_len": 4}))
    # mimic OmegaConf attribute access used by the pseudo branch
    conf.model.params = type("P", (), {"context_dim": 8, "pooled_dim": 8})()
    conf.data.params = {"context_len": 4}
    args = argparse.Namespace(embeddings=None, class_idx=None, prompt="a cat",
                              weights=None, context_len=None)
    want_ctx, want_pool = sample_mmdit._conditioning(args, conf, None,
                                                     get_logger())
    np.testing.assert_array_equal(ctx, want_ctx)
    np.testing.assert_array_equal(pool, want_pool)
    # distinct prompts -> distinct rows
    ctx2, _ = encode_prompts.demo_rows(["a dog"], 4, 8, 8)
    assert not np.allclose(ctx, ctx2)


def test_assemble_sd3_layout():
    """CLIP halves concat on width then zero-pad to the T5 width; T5 tokens
    append on the sequence axis; pooled is the L|G concat."""
    from encode_prompts import assemble_sd3

    B, T = 2, 3
    l_h = jnp.ones((B, T, 4))
    g_h = 2 * jnp.ones((B, T, 6))
    t5 = 3 * jnp.ones((B, 5, 16))
    ctx, pool = assemble_sd3(l_h, jnp.ones((B, 4)), g_h, 2 * jnp.ones((B, 6)),
                             t5)
    assert ctx.shape == (B, T + 5, 16) and pool.shape == (B, 10)
    np.testing.assert_array_equal(np.asarray(ctx[:, :T, :4]), 1.0)
    np.testing.assert_array_equal(np.asarray(ctx[:, :T, 4:10]), 2.0)
    np.testing.assert_array_equal(np.asarray(ctx[:, :T, 10:]), 0.0)  # pad
    np.testing.assert_array_equal(np.asarray(ctx[:, T:]), 3.0)
    np.testing.assert_array_equal(np.asarray(pool[:, :4]), 1.0)
    np.testing.assert_array_equal(np.asarray(pool[:, 4:]), 2.0)
    with pytest.raises(ValueError, match="exceeds"):
        assemble_sd3(l_h, jnp.ones((B, 4)), g_h, jnp.ones((B, 6)),
                     jnp.ones((B, 5, 8)))  # clip joint 10 > 8


class _StubTokenizer:
    """Deterministic per-text ids in the CLIPTokenizer call shape."""

    def __init__(self, vocab=32):
        self.vocab = vocab

    def __call__(self, texts, truncation=True, max_length=77,
                 padding="max_length", return_tensors="np"):
        import hashlib

        ids = []
        for t in texts:
            h = hashlib.sha256(t.encode()).digest()
            rs = np.random.RandomState(int.from_bytes(h[:4], "little"))
            row = rs.randint(3, self.vocab - 1, size=(max_length,))
            row[0], row[-1] = 0, self.vocab - 1
            ids.append(row)
        return {"input_ids": np.stack(ids)}


def test_encode_real_tiny_towers_no_t5():
    """Tiny CLIP towers + --no_t5 zero fill: shapes, pad layout, projected
    bigG pooled width."""
    from encode_prompts import encode_real
    from dmtpu.models.stablediffusion.text_encoders import (
        FrozenCLIPEmbedder, FrozenOpenCLIPEmbedder)

    T = 6
    clip_l = FrozenCLIPEmbedder(
        "clip-vit-l", max_length=T,
        config_overrides=dict(width=8, layers=2, heads=2, vocab_size=32))
    clip_g = FrozenOpenCLIPEmbedder(
        "open-clip-vit-bigg", max_length=T, layer="penultimate",
        config_overrides=dict(width=16, layers=2, heads=2, vocab_size=32,
                              projection_dim=12))
    clip_l.tokenizer = clip_g.tokenizer = _StubTokenizer()
    ids = jnp.asarray(clip_l.tokenize(["x"]))
    lp = clip_l.model.init(jax.random.PRNGKey(0), ids,
                           output_layer="penultimate-nonorm",
                           return_pooled=True)
    gp = clip_g.model.init(jax.random.PRNGKey(1), ids,
                           output_layer="penultimate-nonorm",
                           return_pooled=True)
    ctx, pool = encode_real(["a cat", "a dog"], clip_l, clip_g, None, lp, gp,
                            context_dim=32)
    assert ctx.shape == (2, 2 * T, 32) and pool.shape == (2, 8 + 12)
    ctx = np.asarray(ctx)
    np.testing.assert_array_equal(ctx[:, :T, 24:], 0.0)  # width pad
    np.testing.assert_array_equal(ctx[:, T:], 0.0)       # zero-filled T5
    assert np.abs(ctx[:, :T, :24]).sum() > 0
    # rows differ by prompt
    assert not np.allclose(ctx[0], ctx[1])


def test_cli_demo_roundtrip_into_sample_mmdit(tmp_path, monkeypatch):
    """encode_prompts (demo, tiny dims, --include_uncond) -> sample_mmdit
    --embeddings: the full cached-prompt serving loop."""
    import encode_prompts
    from tests.test_sample_mmdit_cli import _run_sample, _write_conf

    out_npz = tmp_path / "emb.npz"
    monkeypatch.setattr(sys, "argv", [
        "encode_prompts.py", "--out", str(out_npz),
        "--prompts", "a cat", "a dog", "--include_uncond",
        "--context_len", "4", "--context_dim", "8", "--pooled_dim", "8"])
    encode_prompts.main()
    data = dict(np.load(out_npz))
    assert data["context"].shape == (3, 4, 8)   # 2 prompts + uncond row
    assert data["pooled"].shape == (3, 8)
    np.testing.assert_array_equal(data["context"][-1], 0.0)

    cfg = _write_conf(tmp_path)
    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", cfg, "--embeddings", str(out_npz),
                              "--save_dir", str(out), "--n_samples", "3",
                              "--batch_size", "3"])
    assert len(os.listdir(out)) == 3


def _hf_to_openclip(hf_sd, width=16, proj=12):
    """HF CLIPText state_dict -> open_clip single-file layout (fused
    in_proj, transformer.resblocks.*, top-level embeddings/ln_final +
    bare text_projection) — the inverse of convert/sd.py's rewriter."""
    from dmtpu.convert.sd import hf_clip_text_strip

    sd = hf_clip_text_strip(hf_sd)
    oc = {}
    for k, v in sd.items():
        if "self_attn.q_proj" in k:
            base = k.split(".self_attn")[0].replace(
                "encoder.layers.", "transformer.resblocks.")
            leaf = k.rsplit(".", 1)[1]
            fused = np.concatenate(
                [sd[k], sd[k.replace("q_proj", "k_proj")],
                 sd[k.replace("q_proj", "v_proj")]], axis=0)
            oc[f"{base}.attn.in_proj_{leaf}"] = fused
        elif "k_proj" in k or "v_proj" in k:
            continue
        elif k == "embeddings.position_embedding.weight":
            oc["positional_embedding"] = v
        else:
            oc[(k.replace("encoder.layers.", "transformer.resblocks.")
                .replace("self_attn.out_proj", "attn.out_proj")
                .replace("layer_norm1", "ln_1").replace("layer_norm2", "ln_2")
                .replace("mlp.fc1", "mlp.c_fc").replace("mlp.fc2", "mlp.c_proj")
                .replace("final_layer_norm", "ln_final")
                .replace("embeddings.token_embedding.weight",
                         "token_embedding.weight"))] = v
    oc["text_projection"] = np.random.RandomState(9).randn(
        width, proj).astype(np.float32)
    return oc


def test_single_file_towers_to_prompt_encoding(tmp_path, monkeypatch):
    """The full 'incl_clips' SD3 landing path: one file bundling MMDiT +
    HF-layout clip_l (projected) + open_clip-layout clip_g ->
    convert_checkpoint extracts tower npz (with inferred configs) ->
    encode_prompts real mode (--no_t5) -> sample_mmdit."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    from dmtpu.models.mmdit import MMDiT
    from tests._tiny_fixtures import make_tiny_clip_dir
    from tests.test_convert_mmdit import _to_sgm

    T, WL, WG, PJ = 8, 16, 16, 12
    cfg_yaml = tmp_path / "conf.yaml"
    cfg_yaml.write_text("""
seed: 0
data:
  target: dmtpu.data.captioned.SyntheticEmbedded
  params: {img_size: 8, channels: 3, n: 8, context_len: 16, context_dim: 40,
           pooled_dim: 24, n_classes: 2}
  img_channels: 3
model:
  target: models.mmdit.MMDiT
  params: {input_size: 8, patch_size: 2, in_channels: 3, hidden_size: 32,
           depth: 2, num_heads: 2, context_dim: 40, pooled_dim: 24}
diffusion:
  target: diffusions.flow.FlowMatching
  params: {total_steps: 1000, respace_steps: 3}
""")
    m = MMDiT(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
              depth=2, num_heads=2, context_dim=40, pooled_dim=24)
    y = {"context": jnp.zeros((1, 4, 40)), "pooled": jnp.zeros((1, 24))}
    params = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)), y)
    sd = {f"model.diffusion_model.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _to_sgm(params).items()
          if not k.startswith(("first_stage_model.", "text_encoders."))}

    tcfg = CLIPTextConfig(vocab_size=256, hidden_size=WL, intermediate_size=4 * WL,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=T, hidden_act="quick_gelu",
                          projection_dim=PJ)
    torch.manual_seed(0)
    clip_l = CLIPTextModelWithProjection(tcfg)
    sd.update({f"text_encoders.clip_l.transformer.{k}": v
               for k, v in clip_l.state_dict().items()})
    torch.manual_seed(1)
    clip_g_hf = CLIPTextModelWithProjection(
        CLIPTextConfig(vocab_size=256, hidden_size=WG, intermediate_size=4 * WG,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=T, hidden_act="gelu"))
    oc = _hf_to_openclip({k: v.detach().numpy()
                          for k, v in clip_g_hf.state_dict().items()
                          if k != "text_projection.weight"},
                         width=WG, proj=PJ)
    sd.update({f"text_encoders.clip_g.{k}": torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in oc.items()})
    ckpt = tmp_path / "sd3_tiny.pt"
    torch.save({"state_dict": sd}, ckpt)

    import convert_checkpoint

    out_npz = tmp_path / "sd3.npz"
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py", "-c",
                                      str(cfg_yaml), "--weights", str(ckpt),
                                      "--out", str(out_npz)])
    convert_checkpoint.main()
    l_npz = tmp_path / "sd3_clip_l.npz"
    g_npz = tmp_path / "sd3_clip_g.npz"
    assert out_npz.is_file() and l_npz.is_file() and g_npz.is_file()
    import json as _json
    lcfg = _json.loads(str(dict(np.load(l_npz, allow_pickle=True))["config"]))
    assert lcfg["width"] == WL and lcfg["projection_dim"] == PJ
    assert lcfg["max_length"] == T

    import encode_prompts

    clip_dir = make_tiny_clip_dir(tmp_path / "clip")
    emb = tmp_path / "emb.npz"
    monkeypatch.setattr(sys, "argv", [
        "encode_prompts.py", "--out", str(emb), "--prompts", "a cat", "a dog",
        "--clip_l_weights", str(l_npz), "--clip_g_weights", str(g_npz),
        "--no_t5", "--context_dim", "40", "--max_length", str(T),
        "--clip_tokenizer", str(clip_dir)])
    encode_prompts.main()
    data = dict(np.load(emb))
    assert data["context"].shape == (2, 2 * T, 40)
    assert data["pooled"].shape == (2, 2 * PJ)
    np.testing.assert_array_equal(data["context"][:, :T, 2 * WG:], 0.0)
    np.testing.assert_array_equal(data["context"][:, T:], 0.0)
    assert not np.allclose(data["context"][0], data["context"][1])

    from tests.test_sample_mmdit_cli import _run_sample

    out = tmp_path / "out"
    _run_sample(monkeypatch, ["-c", str(cfg_yaml), "--weights", str(out_npz),
                              "--embeddings", str(emb), "--save_dir", str(out),
                              "--n_samples", "2", "--batch_size", "2"])
    assert len(os.listdir(out)) == 2


def test_cli_arg_validation(tmp_path, monkeypatch):
    import encode_prompts

    monkeypatch.setattr(sys, "argv",
                        ["encode_prompts.py", "--out", str(tmp_path / "x.npz")])
    with pytest.raises(SystemExit, match="no prompts"):
        encode_prompts.main()
    monkeypatch.setattr(sys, "argv", [
        "encode_prompts.py", "--out", str(tmp_path / "x.npz"),
        "--prompts", "p", "--clip_l_weights", "l.npz"])
    with pytest.raises(SystemExit, match="BOTH"):
        encode_prompts.main()
    monkeypatch.setattr(sys, "argv", [
        "encode_prompts.py", "--out", str(tmp_path / "x.npz"),
        "--prompts", "p", "--clip_l_weights", "l.npz",
        "--clip_g_weights", "g.npz"])
    monkeypatch.delenv("DMTPU_CLIP_TOKENIZER", raising=False)
    with pytest.raises(SystemExit, match="t5_dir or --no_t5"):
        encode_prompts.main()
