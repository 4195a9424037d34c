"""SD stack parity: UNet / VAE / text encoder vs importable torch oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.convert import convert_by_structure
from dmtpu.convert.sd import hf_clip_text_strip, openclip_text_to_hf
from dmtpu.models.stablediffusion import AutoencoderKL, CLIPTextTransformer, SDUNetModel
from tests.conftest import require_reference


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _randomize_zeros(ref):
    import torch
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)


SD_UNET_CFG = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=32,
    attention_resolutions=[2, 1], num_res_blocks=1, channel_mult=[1, 2],
    num_heads=2, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24, legacy=False,
)


def test_sd_unet_parity():
    require_reference()
    import torch
    from models.stablediffusion.unet import UNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(**SD_UNET_CFG, use_checkpoint=False)
    ref.eval()
    _randomize_zeros(ref)

    model = SDUNetModel(**SD_UNET_CFG)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([3, 700])
    ctx = rs.randn(2, 7, 24).astype(np.float32)

    x_j = jnp.asarray(nhwc(x))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), jnp.asarray(ctx))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_by_structure(sd, init)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    got = nchw(np.asarray(model.apply(params, x_j, jnp.asarray(t), jnp.asarray(ctx))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_sdxl_unet_parity():
    """Per-level transformer depth + sequential label embedding (SDXL path)."""
    require_reference()
    import torch
    from models.sdxl.unet import UNetModel as RefXL

    cfg = dict(
        in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2, 1], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=8, transformer_depth=[1, 2], context_dim=24,
        use_linear_in_transformer=True, num_classes="sequential", adm_in_channels=16,
    )
    torch.manual_seed(0)
    ref = RefXL(**cfg)
    ref.eval()
    _randomize_zeros(ref)

    model = SDUNetModel(legacy=False, **cfg)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([11, 400])
    ctx = rs.randn(2, 7, 24).astype(np.float32)
    vec = rs.randn(2, 16).astype(np.float32)

    x_j = jnp.asarray(nhwc(x))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), jnp.asarray(ctx),
                      jnp.asarray(vec))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_by_structure(sd, init)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx),
                   torch.from_numpy(vec)).numpy()
    got = nchw(np.asarray(model.apply(params, x_j, jnp.asarray(t), jnp.asarray(ctx),
                                      jnp.asarray(vec))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_vae_parity():
    require_reference()
    import torch
    from models.stablediffusion.autoencoder import AutoEncoderKL as RefVAE

    cfg = dict(embed_dim=4, z_channels=4, resolution=32, in_channels=3, out_ch=3,
               ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16])
    torch.manual_seed(0)
    ref = RefVAE(**cfg)
    ref.eval()

    model = AutoencoderKL(**cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(2, 3, 32, 32).astype(np.float32)
    x_j = jnp.asarray(nhwc(x))
    init = model.init(jax.random.PRNGKey(0), x_j, jax.random.PRNGKey(1))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_by_structure(sd, init)

    # encoder moments
    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x))
        want_moments = torch.cat([post.mean, post.logvar], dim=1).numpy()
    got_moments = nchw(np.asarray(model.apply(params, x_j, method=model.encode_moments)))
    # note logvar clamp happens inside the distribution on both sides
    np.testing.assert_allclose(got_moments, want_moments, rtol=5e-4, atol=5e-4)

    # decoder
    z = rs.randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        want_dec = ref.decode(torch.from_numpy(z)).numpy()
    got_dec = nchw(np.asarray(model.apply(params, jnp.asarray(nhwc(z)), method=model.decode)))
    np.testing.assert_allclose(got_dec, want_dec, rtol=5e-4, atol=5e-4)


def test_clip_text_parity_vs_transformers():
    """Our Flax CLIP text tower vs torch transformers CLIPTextModel."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=128,
                         num_hidden_layers=3, num_attention_heads=4,
                         max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(0)
    ref = CLIPTextModel(cfg)
    ref.eval()

    model = CLIPTextTransformer(vocab_size=100, max_length=16, width=32, layers=3, heads=4)
    ids = np.array([[1, 5, 7, 99, 2, 0, 0, 0], [3, 4, 98, 2, 0, 0, 0, 0]], np.int32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    sd = hf_clip_text_strip({k: v.detach().numpy() for k, v in ref.state_dict().items()})
    params = convert_by_structure(sd, init)

    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True)
    # last hidden state (with final LN)
    got = np.asarray(model.apply(params, jnp.asarray(ids), output_layer="last"))
    np.testing.assert_allclose(got, out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4)
    # hidden_states[-2] (no final LN) — FrozenCLIPEmbedder layer='hidden'
    got_h = np.asarray(model.apply(params, jnp.asarray(ids), output_layer=-2))
    np.testing.assert_allclose(got_h, out.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-4)


def test_openclip_layout_conversion():
    """Fused-in_proj open_clip layout converts to the same params as HF layout."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=50, hidden_size=16, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=8, hidden_act="gelu")
    torch.manual_seed(1)
    ref = CLIPTextModel(cfg)
    hf_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # build the equivalent open_clip-style dict
    oc = {}
    for k, v in hf_clip_text_strip(hf_sd).items():
        if "self_attn.q_proj" in k:
            base = k.split(".self_attn")[0].replace("encoder.layers.", "transformer.resblocks.")
            leaf = k.rsplit(".", 1)[1]
            fused = np.concatenate([
                hf_clip_text_strip(hf_sd)[k],
                hf_clip_text_strip(hf_sd)[k.replace("q_proj", "k_proj")],
                hf_clip_text_strip(hf_sd)[k.replace("q_proj", "v_proj")],
            ], axis=0)
            oc[f"{base}.attn.in_proj_{leaf}"] = fused
        elif "k_proj" in k or "v_proj" in k:
            continue
        else:
            nk = (k.replace("encoder.layers.", "transformer.resblocks.")
                  .replace("self_attn.out_proj", "attn.out_proj")
                  .replace("layer_norm1", "ln_1").replace("layer_norm2", "ln_2")
                  .replace("mlp.fc1", "mlp.c_fc").replace("mlp.fc2", "mlp.c_proj")
                  .replace("final_layer_norm", "ln_final")
                  .replace("embeddings.token_embedding.weight", "token_embedding.weight"))
            if k == "embeddings.position_embedding.weight":
                oc["positional_embedding"] = v
            else:
                oc[nk] = v

    model = CLIPTextTransformer(vocab_size=50, max_length=8, width=16, layers=2, heads=2,
                                act="gelu")
    ids = np.array([[1, 5, 7, 2]], np.int32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    p_hf = convert_by_structure(hf_clip_text_strip(hf_sd), init)
    p_oc = convert_by_structure(openclip_text_to_hf(oc), init)
    for a, b in zip(jax.tree.leaves(p_hf), jax.tree.leaves(p_oc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_penultimate_nonorm_semantics():
    """SDXL's bigG crossattn slice is the RAW penultimate hidden —
    ln_final is only applied for the pooled vector (reference:
    models/sdxl/conditioner.py:307-331, legacy=False).  'penultimate'
    (SD2.x legacy) = final LN of the same hidden."""
    from dmtpu.models.stablediffusion.text_encoders import CLIPTextTransformer
    from flax import linen as nn

    model = CLIPTextTransformer(vocab_size=50, max_length=8, width=16,
                                layers=2, heads=2, projection_dim=16)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 50, (2, 8)))
    params = model.init(jax.random.PRNGKey(0), ids, return_pooled=True)

    raw = model.apply(params, ids, output_layer="penultimate-nonorm")
    ln = model.apply(params, ids, output_layer="penultimate")
    p = params["params"]["final_layer_norm"]
    want_ln = nn.LayerNorm(epsilon=1e-5).apply({"params": p}, raw)
    np.testing.assert_allclose(np.asarray(ln), np.asarray(want_ln), rtol=1e-5, atol=1e-6)
    assert float(np.max(np.abs(np.asarray(ln) - np.asarray(raw)))) > 1e-3

    # pooled vector is unaffected by the crossattn-slice choice
    _, pooled_a = model.apply(params, ids, output_layer="penultimate-nonorm",
                              return_pooled=True)
    _, pooled_b = model.apply(params, ids, output_layer="penultimate",
                              return_pooled=True)
    np.testing.assert_allclose(np.asarray(pooled_a), np.asarray(pooled_b))

    with pytest.raises(ValueError, match="layer_idx"):
        model.apply(params, ids, output_layer=None)
