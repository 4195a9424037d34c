"""sail-sg MDTv2 (Masked Diffusion Transformer), in Flax — ImageNet 256 pretrained.

Architecture parity with reference: models/mdt/model.py — relative-position-
bias attention (:13-99), encoder/decoder split with skip links (:246-527),
``random_masking`` + ``forward_side_interpolater`` masked latent modelling
(:390-438), and the power-cosine timestep-dependent CFG scale
(:503-527, ``forward_with_cfg``).

JAX notes: masked training needs a STATIC keep-length — pass ``len_keep``
(computed host-side from the sampled mask ratio; the reference draws a
continuous ratio per step, which would retrace per value).  Inference
(``enable_mask=False``) is shape-static and identical to the reference.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmtpu.models.adm import timestep_embedding
from dmtpu.models.dit import TimmMlp, get_2d_sincos_pos_embed, modulate

Array = jax.Array


def sample_len_keep(num_patches: int, mask_ratio: float, u: float,
                    n_buckets: int = 8) -> int:
    """Bucketed masked-training keep-length.

    The reference draws a CONTINUOUS per-step ratio
    ``r ~ U[mask_ratio, mask_ratio + 0.2]`` and keeps ``int(L·(1-r))`` tokens
    (reference: models/mdt/model.py:463-467, 390-397).  A continuous draw
    would retrace/rec compile per distinct value under jit, so the ratio is
    snapped to ``n_buckets`` evenly spaced static keep-lengths spanning the
    same range — at most ``n_buckets`` compiles, matching the reference's
    mean and spread (tested in tests/test_dit_mdt.py).

    ``u``: host-side uniform draw in [0, 1) (e.g. ``float(np.random.rand())``
    or a folded-key ``jax.random.uniform`` pulled to host once per step).
    Returns a static Python int for the model's ``len_keep`` argument.
    """
    # epsilon guard: 1-0.3-0.2 = 0.4999... in binary would put lo one token
    # below the reference distribution's support (int(256*0.5) = 128, not 127)
    lo = int(np.floor(num_patches * (1 - mask_ratio - 0.2) + 1e-6))
    hi = int(np.floor(num_patches * (1 - mask_ratio) + 1e-6))
    buckets = np.unique(np.linspace(lo, hi, n_buckets).round().astype(int))
    target = num_patches * (1 - (mask_ratio + 0.2 * float(u)))
    return int(buckets[np.argmin(np.abs(buckets - target))])


def _relative_position_index(grid: int) -> np.ndarray:
    """BEiT-style pairwise relative position index.  (reference: models/mdt/model.py:61-99)"""
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    return rel.sum(-1)


class RelPosAttention(nn.Module):
    """MDT attention with relative position bias.  (reference: models/mdt/model.py:13-58)"""

    num_heads: int
    num_patches: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, ids_keep: Optional[Array] = None) -> Array:
        b, t, d = x.shape
        heads, hd = self.num_heads, d // self.num_heads
        grid = int(self.num_patches ** 0.5)
        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        table = self.param(
            "rel_pos_bias__relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((2 * grid - 1) * (2 * grid - 1) + 3, heads),
        )
        idx = jnp.asarray(_relative_position_index(grid))
        bias = table[idx.reshape(-1)].reshape(self.num_patches, self.num_patches, heads)
        bias = jnp.transpose(bias, (2, 0, 1))  # [H, T, T]
        if ids_keep is not None:
            # gather kept rows/cols per sample: [B, H, keep, keep]
            bias = jnp.broadcast_to(bias[None], (b,) + bias.shape)
            bias = jnp.take_along_axis(bias, ids_keep[:, None, :, None], axis=2)
            bias = jnp.take_along_axis(bias, ids_keep[:, None, None, :], axis=3)
        else:
            bias = bias[None]

        scale = hd ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
                            k.astype(jnp.float32))
        logits = logits + bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class MDTBlock(nn.Module):
    """(reference: models/mdt/model.py:187-221)"""

    num_heads: int
    num_patches: int
    mlp_ratio: float = 4.0
    skip: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, c: Array, skip: Optional[Array] = None,
                 ids_keep: Optional[Array] = None) -> Array:
        d = x.shape[-1]
        if self.skip:
            x = nn.Dense(d, name="skip_linear")(jnp.concatenate([x, skip], axis=-1))
        mod = nn.Dense(6 * d, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="adaLN_modulation__1")(jax.nn.silu(c))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        ln = lambda z: nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(z)  # noqa: E731
        x = x + g_msa[:, None] * RelPosAttention(self.num_heads, self.num_patches,
                                                 dtype=self.dtype, name="attn")(
            modulate(ln(x), s_msa, sc_msa), ids_keep=ids_keep)
        x = x + g_mlp[:, None] * TimmMlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            modulate(ln(x), s_mlp, sc_mlp))
        return x


class MDTv2(nn.Module):
    """(reference: models/mdt/model.py:246-527); NHWC in/out."""

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
    mask_ratio: Optional[float] = None
    decode_layer: int = 4
    # jax.checkpoint each MDTBlock: True / False / policy name (selective remat)
    use_checkpoint: Any = False
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @staticmethod
    def random_masking(x: Array, len_keep: int, rng: Array) -> Tuple[Array, Array, Array, Array]:
        """Static-length variant of reference :390-417."""
        n, l, d = x.shape
        noise = jax.random.uniform(rng, (n, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((n, l))
        mask = mask.at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore, ids_keep

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Optional[Array] = None, *,
                 enable_mask: bool = False, len_keep: Optional[int] = None,
                 mask_rng: Optional[Array] = None, train: bool = False,
                 force_drop_rng: Optional[Array] = None) -> Array:
        b, h, w, cin = x.shape
        p = self.patch_size
        grid = self.input_size // p
        num_patches = grid * grid
        half_depth = (self.depth - self.decode_layer) // 2
        if y is None:
            y = jnp.full((b,), self.num_classes, jnp.int32)

        tokens = nn.Conv(self.hidden_size, (p, p), strides=p, padding=0,
                         dtype=self.dtype, name="x_embedder__proj")(x)
        tokens = tokens.reshape(b, num_patches, self.hidden_size)
        pos = self.param("pos_embed",
                         lambda k, s: jnp.asarray(get_2d_sincos_pos_embed(s[-1], grid)[None], jnp.float32),
                         (1, num_patches, self.hidden_size))
        tokens = tokens + pos.astype(tokens.dtype)

        te = timestep_embedding(t, 256)
        te = nn.Dense(self.hidden_size, name="t_embedder__mlp__0")(te)
        te = nn.Dense(self.hidden_size, name="t_embedder__mlp__2")(jax.nn.silu(te))
        if train and self.class_dropout_prob > 0 and force_drop_rng is not None:
            drop = jax.random.bernoulli(force_drop_rng, self.class_dropout_prob, (b,))
            y = jnp.where(drop, self.num_classes, y)
        n_rows = self.num_classes + (1 if self.class_dropout_prob > 0 else 0)
        ye = nn.Embed(n_rows, self.hidden_size, name="y_embedder__embedding_table")(
            jnp.asarray(y, jnp.int32))
        c = te + ye

        input_skip = tokens
        xx = tokens
        masked = self.mask_ratio is not None and enable_mask
        if masked:
            assert len_keep is not None and mask_rng is not None
            xx, mask, ids_restore, ids_keep = self.random_masking(xx, len_keep, mask_rng)
        else:
            mask = ids_restore = ids_keep = None

        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)

        def blkcall(blk: nn.Module, z: Array, skip: Optional[Array] = None,
                    ids_keep_: Optional[Array] = None) -> Array:
            if ckpt:
                return nn.remat(lambda m, a, b, s, ik: m(a, b, skip=s, ids_keep=ik),
                                policy=policy)(blk, z, c, skip, ids_keep_)
            return blk(z, c, skip=skip, ids_keep=ids_keep_)

        skips = []
        for i in range(half_depth):
            xx = blkcall(MDTBlock(self.num_heads, num_patches, self.mlp_ratio, dtype=self.dtype,
                                  name=f"en_inblocks__{i}"), xx, ids_keep_=ids_keep)
            skips.append(xx)
        for i in range(half_depth):
            xx = blkcall(MDTBlock(self.num_heads, num_patches, self.mlp_ratio, skip=True,
                                  dtype=self.dtype, name=f"en_outblocks__{i}"),
                         xx, skip=skips.pop(), ids_keep_=ids_keep)

        dec_pos = self.param("decoder_pos_embed",
                             lambda k, s: jnp.asarray(get_2d_sincos_pos_embed(s[-1], grid)[None], jnp.float32),
                             (1, num_patches, self.hidden_size))
        mask_token = self.param("mask_token", nn.initializers.truncated_normal(0.02 / 0.87962566103423978)
                                if self.mask_ratio is not None else nn.initializers.zeros,
                                (1, 1, self.hidden_size))

        if masked:
            # side interpolater (reference :419-438)
            n_masked = num_patches - xx.shape[1]
            mask_tokens = jnp.broadcast_to(mask_token, (b, n_masked, self.hidden_size))
            x_ = jnp.concatenate([xx, mask_tokens], axis=1)
            xx = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
            xx = xx + dec_pos.astype(xx.dtype)
            x_before = xx
            xx = MDTBlock(self.num_heads, num_patches, self.mlp_ratio, dtype=self.dtype,
                          name="sideblocks__0")(xx, c)
            m = mask[:, :, None]
            xx = xx * m + (1 - m) * x_before
        else:
            # materialise sideblock params even when unused (checkpoint parity);
            # the 1-token call is dead code XLA removes, but registers params
            _ = MDTBlock(self.num_heads, num_patches, self.mlp_ratio, dtype=self.dtype,
                         name="sideblocks__0")(jnp.zeros_like(xx), c)
            xx = xx + dec_pos.astype(xx.dtype)

        for i in range(self.decode_layer):
            xx = blkcall(MDTBlock(self.num_heads, num_patches, self.mlp_ratio, skip=True,
                                  dtype=self.dtype, name=f"de_blocks__{i}"), xx, skip=input_skip)

        from dmtpu.models.dit import FinalLayer

        xx = FinalLayer(p, self.out_channels, dtype=self.dtype, name="final_layer")(xx, c)
        out = xx.reshape(b, grid, grid, p, p, self.out_channels)
        out = jnp.einsum("nhwpqc->nhpwqc", out).reshape(b, grid * p, grid * p, self.out_channels)
        return out

    def forward_with_cfg(self, x: Array, t: Array, y: Array, cfg_scale: Optional[float] = None,
                         diffusion_steps: int = 1000, scale_pow: float = 4.0) -> Array:
        """Power-cosine-scaled CFG.  (reference: models/mdt/model.py:503-527)"""
        if cfg_scale is None:
            model_out = self(x, t, y)
            return model_out
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self(combined, t, y)
        eps, rest = model_out[..., :3], model_out[..., 3:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        tt = jnp.asarray(t, jnp.float32)
        scale_step = (1 - jnp.cos(((1 - tt / diffusion_steps) ** scale_pow) * math.pi)) / 2
        real = (cfg_scale - 1) * scale_step + 1
        real = real[: x.shape[0] // 2].reshape(-1, 1, 1, 1)
        half_eps = uncond_eps + real * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)
