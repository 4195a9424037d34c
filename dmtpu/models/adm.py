"""OpenAI ADM (guided-diffusion) UNet family, in Flax/NHWC.

Architecture parity with reference: models/adm/unet.py — scale-shift-norm
ResBlocks (:162-276), multi-head attention with the fp16-stable
``(q*scale)·(k*scale)`` product and f32 softmax (:347-411, QKVAttentionLegacy
/ QKVAttention orders), resblock up/downsampling, learned-range variance
output (out_channels=6), plus:
  - ``SuperResModel`` (:685-700) — low-res conditioning channel concat
  - ``EncoderUNetModel`` (:703-913) — classifier half-UNet, all 4 pool modes
  - ``UNetCombined`` (reference: models/adm/unet_combined.py:6-32)

The reference's fp16-torso conversion (:21-38) becomes a ``torso_dtype``
policy (bfloat16 on TPU): GroupNorm always computes in f32 (GroupNorm32,
reference: models/adm/nn.py:17) and softmax accumulates in f32.

Flax submodule names mirror the torch paths (``.`` → ``__``) so checkpoint
conversion is mechanical (``dmtpu.convert``).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmtpu.ops.attention import mha

Array = jax.Array


def timestep_embedding(timesteps: Array, dim: int, max_period: int = 10000) -> Array:
    """ADM sinusoidal embedding: cos-first, freqs = exp(-ln(P)·i/half).

    (reference: models/adm/nn.py:103-122)
    """
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float64) / half)
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * jnp.asarray(freqs, jnp.float32)[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn32(x: Array, name: str) -> Array:
    """GroupNorm computed in f32, output restored to input dtype (GroupNorm32,
    reference: models/adm/nn.py:17).  Must be called inside a compact scope."""
    out = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)(
        x.astype(jnp.float32))
    return out.astype(x.dtype)


def _zeros_conv(features, kernel, name, strides=1, padding=1, dtype=None):
    """zero_module'd conv (reference: models/adm/nn.py:68-74)."""
    return nn.Conv(features, (kernel, kernel), strides=strides, padding=padding,
                   kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                   dtype=dtype, name=name)


def remat_call(mod: nn.Module, *args, train: Optional[bool] = None, policy=None):
    """Gradient checkpointing: run the submodule under ``jax.checkpoint`` so
    its intermediates are recomputed in the backward pass instead of saved
    (reference: models/adm/nn.py:124-170).  Param tree and gradients are
    identical to the plain call; only peak memory changes.  ``train`` stays a
    Python static via closure (it gates dropout determinism).  ``policy``
    (a ``jax.checkpoint_policies`` callable, see dmtpu/ops/rematerialize.py)
    selects SELECTIVE remat — save matmul outputs, recompute elementwise."""
    if train is None:
        return nn.remat(lambda m, *a: m(*a), policy=policy)(mod, *args)
    return nn.remat(lambda m, *a: m(*a, train=train), policy=policy)(mod, *args)


def resolve_torso_dtype(torso_dtype, use_fp16: bool, use_bf16: bool = False):
    """Map the reference's fp16/bf16 torso-conversion flags (reference:
    models/adm/unet.py:21-38, models/stablediffusion/unet.py:466-467) onto a
    compute-dtype policy.  fp16 configs get bfloat16 on TPU — same memory,
    MXU-native, no loss-scaling needed."""
    if torso_dtype is not None:
        return torso_dtype
    if use_fp16 or use_bf16:
        return jnp.bfloat16
    return None


class _Upsample(nn.Module):
    """(reference: models/adm/unet.py:97-130)"""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        if self.use_conv:
            x = nn.Conv(self.out_channels or c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class _Downsample(nn.Module):
    """(reference: models/adm/unet.py:132-159)"""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        if self.use_conv:
            return nn.Conv(self.out_channels or c, (3, 3), strides=2, padding=1,
                           dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """(reference: models/adm/unet.py:162-276)"""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, emb: Array, *, train: bool = False) -> Array:
        ch = x.shape[-1]
        out_ch = self.out_channels or ch

        def updown(z):
            b, hh, ww, cc = z.shape
            if self.up:
                return jax.image.resize(z, (b, 2 * hh, 2 * ww, cc), method="nearest")
            if self.down:
                return nn.avg_pool(z, (2, 2), strides=(2, 2))
            return z

        h = _gn32(x, "in_layers__0")
        h = jax.nn.silu(h)
        if self.up or self.down:
            h = updown(h)
            x = updown(x)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_layers__2")(h)

        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=self.dtype, name="emb_layers__1")(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _gn32(h, "out_layers__0") * (1 + scale) + shift
        else:
            h = h + emb_out
            h = _gn32(h, "out_layers__0")
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _zeros_conv(out_ch, 3, "out_layers__3", dtype=self.dtype)(h)

        if out_ch == ch:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="skip_connection")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip_connection")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """(reference: models/adm/unet.py:278-325 + 347-411)

    ``new_order=False`` → QKVAttentionLegacy channel layout (heads × (q,k,v) × ch);
    ``new_order=True``  → QKVAttention layout ((q,k,v) × heads × ch).
    """

    num_heads: int = 1
    num_head_channels: int = -1
    new_order: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        heads = self.num_heads if self.num_head_channels == -1 else c // self.num_head_channels
        hd = c // heads
        xn = _gn32(x, "norm").reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xn)  # torch conv1d k=1
        if self.new_order:
            qkv = qkv.reshape(b, h * w, 3, heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            qkv = qkv.reshape(b, h * w, heads, 3, hd)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        out = mha(q, k, v, scale=1.0 / math.sqrt(hd))
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="proj_out")(out.reshape(b, h * w, c))
        return x + out.reshape(b, h, w, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling.  (reference: models/adm/unet.py:40-73)"""

    num_head_channels: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param("positional_embedding",
                         lambda k, s: jax.random.normal(k, s) / (c ** 0.5),
                         (c, h * w + 1))
        tokens = tokens + pos.T[None].astype(tokens.dtype)
        heads = c // self.num_head_channels
        hd = c // heads
        qkv = nn.Dense(3 * c, name="qkv_proj")(tokens)
        s = tokens.shape[1]
        qkv = qkv.reshape(b, s, 3, heads, hd)  # QKVAttention (new order)
        out = mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=1.0 / math.sqrt(hd))
        out = nn.Dense(self.output_dim or c, name="c_proj")(out.reshape(b, s, c))
        return out[:, 0]


class UNetModel(nn.Module):
    """(reference: models/adm/unet.py:415-683)"""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_fp16: bool = False        # fp16 torso configs → bfloat16 torso on TPU
    # jax.checkpoint (remat) ResBlocks + attention: True = full remat, or a
    # policy name string (dmtpu/ops/rematerialize.py) for selective remat
    use_checkpoint: Any = False
    torso_dtype: Any = None       # explicit override, e.g. jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, y: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        dt = resolve_torso_dtype(self.torso_dtype, self.use_fp16)
        ted = self.model_channels * 4

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(ted, name="time_embed__0")(emb)
        emb = nn.Dense(ted, name="time_embed__2")(jax.nn.silu(emb))
        if self.num_classes is not None:
            if y is None:
                raise ValueError("class-conditional model requires y")
            emb = emb + nn.Embed(self.num_classes, ted, name="label_emb")(jnp.asarray(y, jnp.int32))

        def attn(idx_name, heads):
            return AttentionBlock(heads, self.num_head_channels,
                                  self.use_new_attention_order, dtype=dt, name=idx_name)

        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)

        def res(rb: nn.Module, hh: Array) -> Array:
            return (remat_call(rb, hh, emb, train=train, policy=policy)
                    if ckpt else rb(hh, emb, train=train))

        def att(ab: nn.Module, hh: Array) -> Array:
            return remat_call(ab, hh, policy=policy) if ckpt else ab(hh)

        h = nn.Conv(int(self.channel_mult[0] * self.model_channels), (3, 3), padding=1,
                    dtype=dt, name="input_blocks__0__0")(x.astype(dt) if dt else x)
        hs = [h]
        ch = h.shape[-1]
        ds = 1
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(ResBlock(int(mult * self.model_channels), self.dropout,
                                 use_scale_shift_norm=self.use_scale_shift_norm, dtype=dt,
                                 name=f"input_blocks__{blk}__0"), h)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions:
                    h = att(attn(f"input_blocks__{blk}__1", self.num_heads), h)
                hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(ResBlock(ch, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                                     down=True, dtype=dt, name=f"input_blocks__{blk}__0"), h)
                else:
                    h = _Downsample(ch, self.conv_resample, dtype=dt,
                                    name=f"input_blocks__{blk}__0")(h)
                hs.append(h)
                ds *= 2
                blk += 1

        h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                         dtype=dt, name="middle_block__0"), h)
        h = att(attn("middle_block__1", self.num_heads), h)
        h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                         dtype=dt, name="middle_block__2"), h)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(ResBlock(int(mult * self.model_channels), self.dropout,
                                 use_scale_shift_norm=self.use_scale_shift_norm, dtype=dt,
                                 name=f"output_blocks__{blk}__0"), h)
                ch = int(mult * self.model_channels)
                j = 1
                if ds in self.attention_resolutions:
                    h = att(attn(f"output_blocks__{blk}__{j}", heads_up), h)
                    j += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(ResBlock(ch, self.dropout,
                                         use_scale_shift_norm=self.use_scale_shift_norm,
                                         up=True, dtype=dt,
                                         name=f"output_blocks__{blk}__{j}"), h)
                    else:
                        h = _Upsample(ch, self.conv_resample, dtype=dt,
                                      name=f"output_blocks__{blk}__{j}")(h)
                    ds //= 2
                blk += 1

        h = h.astype(x.dtype)
        h = _gn32(h, "out__0")
        h = jax.nn.silu(h)
        return _zeros_conv(self.out_channels, 3, "out__2")(h)


class SuperResModel(nn.Module):
    """Low-res-conditioned UNet.  (reference: models/adm/unet.py:685-700)

    Constructor takes the SAME in_channels as the reference CLI (doubled
    internally).
    """

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    kwargs: dict = None

    def setup(self):
        kw = dict(self.kwargs or {})
        self.unet = UNetModel(
            image_size=self.image_size, in_channels=self.in_channels * 2,
            model_channels=self.model_channels, out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions, name="unet", **kw)

    def __call__(self, x: Array, timesteps: Array, low_res: Optional[Array] = None, **kwargs) -> Array:
        b, h, w, c = x.shape
        up = jax.image.resize(low_res, (low_res.shape[0], h, w, low_res.shape[-1]), "bilinear")
        return self.unet(jnp.concatenate([x, up], axis=-1), timesteps, **kwargs)


class EncoderUNetModel(nn.Module):
    """Classifier half-UNet.  (reference: models/adm/unet.py:703-913)"""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_fp16: bool = False
    use_checkpoint: Any = False
    pool: str = "adaptive"
    torso_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, *, train: bool = False) -> Array:
        dt = resolve_torso_dtype(self.torso_dtype, self.use_fp16)
        ted = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(ted, name="time_embed__0")(emb)
        emb = nn.Dense(ted, name="time_embed__2")(jax.nn.silu(emb))

        results = []

        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)

        def res(rb: nn.Module, hh: Array) -> Array:
            return (remat_call(rb, hh, emb, train=train, policy=policy)
                    if ckpt else rb(hh, emb, train=train))

        def att(ab: nn.Module, hh: Array) -> Array:
            return remat_call(ab, hh, policy=policy) if ckpt else ab(hh)

        def pool_feat(z):
            return z.astype(x.dtype).mean(axis=(1, 2))

        h = nn.Conv(int(self.channel_mult[0] * self.model_channels), (3, 3), padding=1,
                    dtype=dt, name="input_blocks__0__0")(x.astype(dt) if dt else x)
        if self.pool.startswith("spatial"):
            results.append(pool_feat(h))
        ch = h.shape[-1]
        ds = 1
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(ResBlock(int(mult * self.model_channels), self.dropout,
                                 use_scale_shift_norm=self.use_scale_shift_norm, dtype=dt,
                                 name=f"input_blocks__{blk}__0"), h)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions:
                    h = att(AttentionBlock(self.num_heads, self.num_head_channels,
                                           self.use_new_attention_order, dtype=dt,
                                           name=f"input_blocks__{blk}__1"), h)
                if self.pool.startswith("spatial"):
                    results.append(pool_feat(h))
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(ResBlock(ch, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                                     down=True, dtype=dt, name=f"input_blocks__{blk}__0"), h)
                else:
                    h = _Downsample(ch, self.conv_resample, dtype=dt,
                                    name=f"input_blocks__{blk}__0")(h)
                if self.pool.startswith("spatial"):
                    results.append(pool_feat(h))
                ds *= 2
                blk += 1

        h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                         dtype=dt, name="middle_block__0"), h)
        h = att(AttentionBlock(self.num_heads, self.num_head_channels,
                               self.use_new_attention_order, dtype=dt, name="middle_block__1"), h)
        h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                         dtype=dt, name="middle_block__2"), h)

        if self.pool == "adaptive":
            h = _gn32(h.astype(x.dtype), "out__0")
            h = jax.nn.silu(h)
            h = h.mean(axis=(1, 2), keepdims=True)
            h = _zeros_conv(self.out_channels, 1, "out__3", padding=0)(h)
            return h.reshape(h.shape[0], -1)
        elif self.pool == "attention":
            h = _gn32(h.astype(x.dtype), "out__0")
            h = jax.nn.silu(h)
            return AttentionPool2d(self.num_head_channels, self.out_channels, name="out__2")(h)
        elif self.pool == "spatial":
            results.append(pool_feat(h))
            feats = jnp.concatenate(results, axis=-1)
            feats = nn.Dense(2048, name="out__0")(feats)
            feats = jax.nn.relu(feats)
            return nn.Dense(self.out_channels, name="out__2")(feats)
        elif self.pool == "spatial_v2":
            results.append(pool_feat(h))
            feats = jnp.concatenate(results, axis=-1)
            feats = nn.Dense(2048, name="out__0")(feats)
            # GroupNorm over the feature vector (reference normalization(2048))
            feats = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out__1")(feats)
            feats = jax.nn.silu(feats)
            return nn.Dense(self.out_channels, name="out__3")(feats)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")


class UNetCombined(nn.Module):
    """Cond + uncond ADM UNets in one module for classifier-free guidance.

    (reference: models/adm/unet_combined.py:6-32).  ``y=None`` routes to the
    unconditional UNet.  For the batched-CFG call layout ([cond; uncond]
    halves), use ``forward_cfg``.
    """

    unet_kwargs: dict

    def setup(self):
        kw = dict(self.unet_kwargs)
        assert kw.get("num_classes") is not None
        self.unet_cond = UNetModel(name="unet_cond", **kw)
        kw_uncond = dict(kw)
        kw_uncond["num_classes"] = None
        self.unet_uncond = UNetModel(name="unet_uncond", **kw_uncond)

    def __call__(self, x: Array, timesteps: Array, y: Optional[Array] = None, **kwargs) -> Array:
        if self.is_initializing():
            # materialise BOTH branches' params (flax only creates params for
            # modules actually called; combine_weights needs the full tree)
            y_init = y if y is not None else jnp.zeros((x.shape[0],), jnp.int32)
            out_c = self.unet_cond(x, timesteps, y_init, **kwargs)
            out_u = self.unet_uncond(x, timesteps, **kwargs)
            return out_u if y is None else out_c
        if y is None:
            return self.unet_uncond(x, timesteps, **kwargs)
        return self.unet_cond(x, timesteps, y, **kwargs)

    def forward_cfg(self, x: Array, timesteps: Array, y: Array, **kwargs) -> Array:
        """First half of the batch conditional (labels y), second half uncond."""
        b = x.shape[0] // 2
        out_c = self.unet_cond(x[:b], timesteps[:b], y[:b], **kwargs)
        out_u = self.unet_uncond(x[b:], timesteps[b:], **kwargs)
        return jnp.concatenate([out_c, out_u], axis=0)
