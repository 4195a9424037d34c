"""FrozenT5Embedder / FrozenCLIPT5Encoder (reference:
models/stablediffusion/text_encoders.py:25-54, 167-182).

Fully offline: a tiny random-init torch T5EncoderModel is saved to a temp
dir and loaded through the same from_pt conversion path real checkpoints
use; outputs must match the torch tower.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

CPU = jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def tiny_t5_dir(tmp_path_factory):
    import torch
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, feed_forward_proj="gated-gelu")
    torch.manual_seed(0)
    ref = T5EncoderModel(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_t5")
    ref.save_pretrained(str(d), safe_serialization=False)
    return str(d), ref


def test_t5_embedder_parity_vs_torch(tiny_t5_dir):
    import torch

    from dmtpu.models.stablediffusion import FrozenT5Embedder

    path, ref = tiny_t5_dir
    with jax.default_device(CPU):
        enc = FrozenT5Embedder(version=None, max_length=16)
        enc._version = path
        enc._ensure_loaded()

        ids = np.array([[3, 17, 99, 1, 0, 0], [5, 5, 2, 88, 77, 1]], np.int32)
        got = np.asarray(enc.encode_tokens(enc.params, jnp.asarray(ids)))
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert got.shape == (2, 6, 32)


def test_clip_t5_dual_encoder_returns_list(tiny_t5_dir):
    """FrozenCLIPT5Encoder returns [clip_z, t5_z] (reference :179-182)."""
    from transformers import FlaxT5EncoderModel

    from dmtpu.models.stablediffusion import FrozenCLIPT5Encoder

    path, _ = tiny_t5_dir

    class FakeTok:
        def __call__(self, texts, **kw):
            n = kw.get("max_length", 77)
            ids = np.ones((len(texts), n), np.int64)
            return {"input_ids": ids}

    with jax.default_device(CPU):
        m = FlaxT5EncoderModel.from_pretrained(path, from_pt=True)
        dual = FrozenCLIPT5Encoder(
            clip_tokenizer=FakeTok(), t5_version=None,
            t5_module=m.module, t5_params={"params": m.params}, t5_tokenizer=FakeTok())
        # tiny CLIP tower: random init for shape semantics
        clip_params = dual.clip_encoder.model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 77), jnp.int32))
        out = dual.encode(["a", "b"], clip_params=clip_params)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].shape == (2, 77, 768)
    assert out[1].shape == (2, 77, 32)


def test_t5_embedder_keeps_injected_params(tiny_t5_dir):
    """Regression: construction with injected params/tokenizer must not
    eagerly (re)load the checkpoint and clobber them."""
    from dmtpu.models.stablediffusion.text_encoders import FrozenT5Embedder

    injected = {"params": {"marker": jnp.ones((1,))}}
    emb = FrozenT5Embedder(version=tiny_t5_dir[0], params=injected,
                           tokenizer=object())
    assert emb.params is injected          # no eager load at init
    emb._ensure_loaded()                   # lazy module load on first use...
    assert emb.module is not None
    assert emb.params is injected          # ...still must not clobber params
