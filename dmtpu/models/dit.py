"""Meta DiT (Diffusion Transformer), in Flax — ImageNet 256/512 pretrained.

Architecture parity with reference: models/dit/model.py — patchify ViT with
adaLN-Zero blocks (:101-122), learn_sigma doubled output channels, frozen 2-D
sin/cos positional embedding (:278-325), null-class label embedding row, and
``forward_with_cfg``'s first-3-channels guidance trick (:254-270).

The timm PatchEmbed / Attention / Mlp dependencies are re-implemented here
(timm layouts preserved so upstream checkpoints convert mechanically).
NHWC in/out; tokens are [B, T, D] and attention rides ``dmtpu.ops.attention``
(f32 softmax; flash path at 512² where T=4096 higher up the stack).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmtpu.models.adm import timestep_embedding  # same GLIDE cos-first embedding
from dmtpu.ops.attention import flash_mha

Array = jax.Array


@functools.lru_cache(maxsize=16)  # rebuilt per jit trace otherwise
def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            offset: int = 0) -> np.ndarray:
    """(reference: models/dit/model.py:276-325)

    ``offset`` shifts both axes to positions [offset, offset+grid_size) —
    the embedding is per-position, so this equals the center crop of a
    larger base table without materialising it (SD3 ``pos_embed_max_size``
    convention; the base table for SD3-medium would be a ~450 MB f64
    transient per trace).  Callers must not mutate the cached array.
    """

    def get_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(offset, offset + grid_size, dtype=np.float32)
    grid_w = np.arange(offset, offset + grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = get_1d(embed_dim // 2, grid[0])
    emb_w = get_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def modulate(x: Array, shift: Array, scale: Array) -> Array:
    return x * (1 + scale[:, None]) + shift[:, None]


class TimmAttention(nn.Module):
    """timm.models.vision_transformer.Attention layout (qkv fused Dense)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd)
        out = flash_mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        return nn.Dense(d, dtype=self.dtype, name="proj")(out.reshape(b, t, d))


class TimmMlp(nn.Module):
    """timm Mlp: fc1 -> gelu(tanh) -> fc2."""

    hidden: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="fc2")(x)


class DiTBlock(nn.Module):
    """adaLN-Zero block.  (reference: models/dit/model.py:101-122)"""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        d = x.shape[-1]
        mod = nn.Dense(6 * d, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="adaLN_modulation__1")(jax.nn.silu(c))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        ln = lambda z: nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(z)  # noqa: E731
        x = x + g_msa[:, None] * TimmAttention(self.num_heads, dtype=self.dtype, name="attn")(
            modulate(ln(x), s_msa, sc_msa))
        x = x + g_mlp[:, None] * TimmMlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            modulate(ln(x), s_mlp, sc_mlp))
        return x


class FinalLayer(nn.Module):
    """(reference: models/dit/model.py:125-142)"""

    patch_size: int
    out_channels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        d = x.shape[-1]
        mod = nn.Dense(2 * d, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="adaLN_modulation__1")(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x), shift, scale)
        return nn.Dense(self.patch_size * self.patch_size * self.out_channels,
                        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                        param_dtype=self.param_dtype, name="linear")(x)


class DiT(nn.Module):
    """(reference: models/dit/model.py:145-270); NHWC in/out."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    # jax.checkpoint each DiTBlock (training memory): True = full remat,
    # or a policy name ("dots", ...) for selective remat
    # (dmtpu/ops/rematerialize.py)
    use_checkpoint: Any = False
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def setup(self):
        # setup-style (not @nn.compact) so `embed`/`head` are separately
        # apply-able seams for pipeline parallelism (dmtpu/parallel/pp.py);
        # explicit name= keeps the converted-checkpoint param tree identical.
        p = self.patch_size
        self.x_proj = nn.Conv(self.hidden_size, (p, p), strides=p, padding=0,
                              dtype=self.dtype, name="x_embedder__proj")
        self.t_mlp0 = nn.Dense(self.hidden_size, name="t_embedder__mlp__0")
        self.t_mlp2 = nn.Dense(self.hidden_size, name="t_embedder__mlp__2")
        n_rows = self.num_classes + (1 if self.class_dropout_prob > 0 else 0)
        self.y_table = nn.Embed(n_rows, self.hidden_size,
                                name="y_embedder__embedding_table")
        self.blocks = [DiTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                                name=f"blocks__{i}") for i in range(self.depth)]
        self.final = FinalLayer(p, self.out_channels, dtype=self.dtype,
                                name="final_layer")

    def embed(self, x: Array, t: Array, y: Optional[Array] = None, *,
              train: bool = False, force_drop_rng: Optional[Array] = None):
        """Patchify + pos embed + (t, y) conditioning -> (tokens, c)."""
        b = x.shape[0]
        p = self.patch_size
        grid = self.input_size // p
        if y is None:
            if self.class_dropout_prob <= 0:
                # the embedding table only has a null row (index num_classes)
                # when CFG dropout is configured; without it an XLA gather
                # would silently CLAMP to the last real class
                raise ValueError(
                    "unconditional forward (y=None) needs the null-label row: "
                    "construct DiT with class_dropout_prob > 0")
            y = jnp.full((b,), self.num_classes, jnp.int32)

        # patchify (timm PatchEmbed = conv p x p stride p) + frozen pos embed
        tokens = self.x_proj(x).reshape(b, grid * grid, self.hidden_size)
        # frozen sin/cos table — a jit-time constant, not a learned variable
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.hidden_size, grid)[None], jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)

        # timestep + label conditioning
        te = timestep_embedding(t, 256)
        te = self.t_mlp2(jax.nn.silu(self.t_mlp0(te)))
        if train and self.class_dropout_prob > 0 and force_drop_rng is not None:
            drop = jax.random.bernoulli(force_drop_rng, self.class_dropout_prob, (b,))
            y = jnp.where(drop, self.num_classes, y)
        ye = self.y_table(jnp.asarray(y, jnp.int32))
        return tokens, te + ye

    def head(self, tokens: Array, c: Array) -> Array:
        """FinalLayer + unpatchify -> NHWC."""
        b = tokens.shape[0]
        p = self.patch_size
        grid = self.input_size // p
        tokens = self.final(tokens, c)
        out = tokens.reshape(b, grid, grid, p, p, self.out_channels)
        return jnp.einsum("nhwpqc->nhpwqc", out).reshape(
            b, grid * p, grid * p, self.out_channels)

    def __call__(self, x: Array, t: Array, y: Optional[Array] = None, *, train: bool = False,
                 force_drop_rng: Optional[Array] = None) -> Array:
        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        tokens, c = self.embed(x, t, y, train=train, force_drop_rng=force_drop_rng)
        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)
        for blk in self.blocks:
            if ckpt:
                tokens = nn.remat(lambda m, a, b: m(a, b), policy=policy)(
                    blk, tokens, c)
            else:
                tokens = blk(tokens, c)
        return self.head(tokens, c)

    def forward_with_cfg(self, x: Array, t: Array, y: Array, cfg_scale: float) -> Array:
        """(reference: models/dit/model.py:254-270) — guidance on first 3 channels."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self(combined, t, y)
        eps, rest = model_out[..., :3], model_out[..., 3:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


# size configs (reference: models/dit/model.py:332-385)
DIT_CONFIGS = {
    "DiT-XL/2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT-XL/4": dict(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT-XL/8": dict(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT-L/2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT-L/4": dict(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT-L/8": dict(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT-B/4": dict(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT-B/8": dict(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT-S/2": dict(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT-S/4": dict(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT-S/8": dict(depth=12, hidden_size=384, patch_size=8, num_heads=6),
}


def dit_model(name: str, **kwargs) -> DiT:
    return DiT(**{**DIT_CONFIGS[name], **kwargs})
