"""SD / SDXL cross-attention UNet, in Flax/NHWC.

One superset module covering both reference UNets:
  - reference: models/stablediffusion/unet.py:422-808 (SD1.5/2.1 —
    ``use_spatial_transformer``, legacy head-dim rules, int transformer_depth)
  - reference: models/sdxl/unet.py:456-837 (SDXL — per-level
    transformer_depth, 'sequential'/'timestep' label embeddings,
    disable_middle_transformer; always spatial transformers)

ResBlocks/Up/Downsample are the ADM ones (identical torch key layout).
The fp16/bf16 torso switch maps to ``torso_dtype=jnp.bfloat16`` with f32
GroupNorm and f32-softmax attention islands.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.adm import (
    AttentionBlock,
    ResBlock,
    _Downsample,
    _Upsample,
    _gn32,
    _zeros_conv,
    remat_call,
    resolve_torso_dtype,
    timestep_embedding,
)
from dmtpu.models.stablediffusion.attention import SpatialTransformer

Array = jax.Array


class SDUNetModel(nn.Module):
    """Superset of the SD and SDXL UNets (see module docstring)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: Union[int, Sequence[int]]
    attention_resolutions: Sequence[int]
    image_size: Optional[int] = None     # accepted for config parity; unused
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[Union[int, str]] = None
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_spatial_transformer: bool = True
    transformer_depth: Union[int, Sequence[int]] = 1
    transformer_depth_middle: Optional[int] = None
    context_dim: Optional[int] = None
    legacy: bool = True
    disable_self_attentions: Optional[Sequence[bool]] = None
    num_attention_blocks: Optional[Sequence[int]] = None
    disable_middle_self_attn: bool = False
    disable_middle_transformer: bool = False
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    use_checkpoint: Any = False  # True / False / policy name (selective remat)
    use_fp16: bool = False
    use_bf16: bool = False
    spatial_transformer_attn_type: str = "softmax"
    torso_dtype: Any = None
    # Token Merging (serving-only acceleration; NO params added — a ToMe
    # model shares its params pytree with the baseline; dmtpu/ops/tome.py).
    # ``tome_max_downsample`` gates which levels merge (1 = only the full-
    # resolution attention level, the tomesd default).
    tome_ratio: float = 0.0
    tome_sx: int = 2
    tome_sy: int = 2
    tome_max_downsample: int = 1
    tome_seed: Optional[int] = None
    # FreeU (serving-only quality knob; NO params — dmtpu/ops/freeu.py):
    # (b1, b2, s1, s2) backbone/skip re-weighting at the two deepest
    # decoder stages, or None (off).
    freeu: Optional[Sequence[float]] = None

    def _dim_head(self, ch: int):
        """Replicates the reference's (quirky) head-dim resolution."""
        num_heads, num_head_channels = self.num_heads, self.num_head_channels
        if num_head_channels == -1:
            dim_head = ch // num_heads
        else:
            num_heads = ch // num_head_channels
            dim_head = num_head_channels
        if self.legacy:
            dim_head = ch // num_heads if self.use_spatial_transformer else num_head_channels
        return num_heads, dim_head

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, context: Optional[Array] = None,
                 y: Optional[Array] = None, *, train: bool = False,
                 dc_skip: Optional[int] = None,
                 dc_cached: Optional[Array] = None) -> Any:
        """Forward pass; optionally a DeepCache full/shallow pass.

        DeepCache (Ma et al. 2023, PAPERS.md block-caching family): deep UNet
        features drift slowly across adjacent sampler steps, so a serving
        loop can run the full UNet every N-th step and, in between, recompute
        only the shallowest ``dc_skip`` skip-connection levels around a
        cached deep feature.  Static modes (jit-friendly — callers pick the
        branch with ``lax.cond`` over two jitted applies):

        - ``dc_skip=None``            -> plain forward, returns ``out``.
        - ``dc_skip=k, dc_cached=None`` -> FULL pass, returns ``(out, u)``
          where ``u`` is the up-path feature entering the last ``k``
          output blocks.
        - ``dc_skip=k, dc_cached=u``  -> SHALLOW pass: runs only the first
          ``k`` input blocks and last ``k`` output blocks, splicing ``u``;
          returns ``(out, u)`` (cache passed through).
        """
        nrb = self.num_res_blocks
        if isinstance(nrb, int):
            nrb = [nrb] * len(self.channel_mult)
        tdepth = self.transformer_depth
        if isinstance(tdepth, int):
            tdepth = [tdepth] * len(self.channel_mult)
        tdepth_mid = self.transformer_depth_middle or tdepth[-1]
        dt = resolve_torso_dtype(self.torso_dtype, self.use_fp16, self.use_bf16)
        ted = self.model_channels * 4

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(ted, name="time_embed__0")(emb)
        emb = nn.Dense(ted, name="time_embed__2")(jax.nn.silu(emb))

        if self.num_classes is not None:
            if y is None:
                raise ValueError("class-conditional model requires y")
            if isinstance(self.num_classes, int):
                emb = emb + nn.Embed(self.num_classes, ted, name="label_emb")(
                    jnp.asarray(y, jnp.int32))
            elif self.num_classes == "continuous":
                emb = emb + nn.Dense(ted, name="label_emb")(y.reshape(-1, 1))
            elif self.num_classes == "sequential":
                h = nn.Dense(ted, name="label_emb__0__0")(y)
                emb = emb + nn.Dense(ted, name="label_emb__0__2")(jax.nn.silu(h))
            elif self.num_classes == "timestep":
                te = timestep_embedding(y.reshape(-1), self.model_channels)
                h = nn.Dense(ted, name="label_emb__1__0")(te)
                emb = emb + nn.Dense(ted, name="label_emb__1__2")(jax.nn.silu(h))
            else:
                raise ValueError(self.num_classes)

        def attn_or_st(idx_name: str, ch: int, depth: int, disable_sa: bool, heads_override=None):
            num_heads, dim_head = self._dim_head(ch)
            if self.use_spatial_transformer:
                # ToMe only at levels within tome_max_downsample (``ds`` is
                # read at the synchronous call site, so it is the level's).
                ratio = self.tome_ratio if ds <= self.tome_max_downsample else 0.0
                return SpatialTransformer(
                    num_heads, dim_head, depth=depth, disable_self_attn=disable_sa,
                    use_linear=self.use_linear_in_transformer,
                    tome_ratio=ratio, tome_sx=self.tome_sx, tome_sy=self.tome_sy,
                    tome_seed=self.tome_seed,
                    # training (remat on) differentiates the attention: the
                    # XLA S-by-S path would materialise f32 logits in the
                    # backward (8 GB at b16 S4096) -- prefer the flash kernel
                    prefer_flash=bool(self.use_checkpoint), dtype=dt, name=idx_name)
            return AttentionBlock(
                heads_override or num_heads, dim_head, self.use_new_attention_order,
                dtype=dt, name=idx_name)

        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        # True = full remat; a policy name string = selective remat
        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)

        def res(rb: nn.Module, hh: Array) -> Array:
            return (remat_call(rb, hh, emb, train=train, policy=policy)
                    if ckpt else rb(hh, emb, train=train))

        def att(ab: nn.Module, hh: Array) -> Array:
            if self.use_spatial_transformer:
                return (remat_call(ab, hh, context, policy=policy)
                        if ckpt else ab(hh, context))
            return remat_call(ab, hh, policy=policy) if ckpt else ab(hh)

        # DeepCache bookkeeping (all static): total skip-connection pops and
        # the boundary output-block index where the cached feature splices in
        shallow = dc_skip is not None and dc_cached is not None
        total_pops = sum(n + 1 for n in nrb)
        if dc_skip is not None:
            if not 0 < dc_skip <= total_pops:
                raise ValueError(f"dc_skip must be in [1, {total_pops}]")
        boundary = total_pops - (dc_skip or 0)

        h = nn.Conv(self.model_channels, (3, 3), padding=1, dtype=dt,
                    name="input_blocks__0__0")(x.astype(dt) if dt else x)
        hs = [h]
        ch = self.model_channels
        ds = 1
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for nr in range(nrb[level]):
                run = not shallow or len(hs) < dc_skip
                if run:
                    h = res(ResBlock(mult * self.model_channels, self.dropout,
                                     use_scale_shift_norm=self.use_scale_shift_norm, dtype=dt,
                                     name=f"input_blocks__{blk}__0"), h)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    dsa = bool(self.disable_self_attentions[level]) if self.disable_self_attentions else False
                    if self.num_attention_blocks is None or nr < self.num_attention_blocks[level]:
                        if run:
                            h = att(attn_or_st(f"input_blocks__{blk}__1", ch, tdepth[level], dsa), h)
                if run:
                    hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if not shallow or len(hs) < dc_skip:
                    if self.resblock_updown:
                        h = res(ResBlock(ch, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                                         down=True, dtype=dt, name=f"input_blocks__{blk}__0"), h)
                    else:
                        h = _Downsample(ch, self.conv_resample, dtype=dt,
                                        name=f"input_blocks__{blk}__0")(h)
                    hs.append(h)
                ds *= 2
                blk += 1

        if not shallow:
            h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=dt, name="middle_block__0"), h)
            if not self.disable_middle_transformer:
                h = att(attn_or_st("middle_block__1", ch, tdepth_mid, self.disable_middle_self_attn), h)
            h = res(ResBlock(None, self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=dt, name="middle_block__2"), h)

        dc_u = dc_cached
        blk = 0
        pop_i = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(nrb[level] + 1):
                run = not shallow or pop_i >= boundary
                if run:
                    if dc_skip is not None and pop_i == boundary:
                        if shallow:
                            h = dc_cached  # splice the cached deep feature
                        else:
                            dc_u = h  # capture: input to the first shallow block
                    sk = hs.pop()
                    if self.freeu is not None:
                        from dmtpu.ops.freeu import apply_freeu

                        fb1, fb2, fs1, fs2 = self.freeu
                        h, sk = apply_freeu(h, sk, self.model_channels,
                                            fb1, fb2, fs1, fs2)
                    h = jnp.concatenate([h, sk], axis=-1)
                    h = res(ResBlock(self.model_channels * mult, self.dropout,
                                     use_scale_shift_norm=self.use_scale_shift_norm, dtype=dt,
                                     name=f"output_blocks__{blk}__0"), h)
                ch = self.model_channels * mult
                j = 1
                if ds in self.attention_resolutions:
                    dsa = bool(self.disable_self_attentions[level]) if self.disable_self_attentions else False
                    if self.num_attention_blocks is None or i < self.num_attention_blocks[level]:
                        heads_up = self.num_heads_upsample if self.num_heads_upsample != -1 else None
                        if run:
                            h = att(attn_or_st(f"output_blocks__{blk}__{j}", ch, tdepth[level], dsa,
                                               heads_override=heads_up), h)
                        j += 1
                if level and i == nrb[level]:
                    if run:
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
                pop_i += 1

        h = h.astype(x.dtype)
        h = _gn32(h, "out__0")
        h = jax.nn.silu(h)
        out = _zeros_conv(self.out_channels, 3, "out__2")(h)
        if dc_skip is not None:
            return out, dc_u
        return out
