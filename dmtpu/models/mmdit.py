"""MMDiT — the SD3-class multimodal diffusion transformer (beyond parity).

The reference repo has no MMDiT; this completes the flow-matching family
(dmtpu/diffusions/flow.py) into a modern text-to-image stack: the
architecture of Esser et al. 2024 ("Scaling Rectified Flow Transformers",
SD3) — two token streams (text context + image patches) with separate
weights that meet in ONE joint attention per block.

TPU-first design notes:

- Pure transformer: every FLOP is a large batched matmul on the MXU; no
  conv backbone, no dynamic shapes.  Tokens are [B, T, D] with the joint
  sequence ``T = L_ctx + L_img`` fed to ``dmtpu.ops.attention.flash_mha``
  (one fused attention over both modalities — the defining MMDiT op —
  rather than two attentions + cross terms).
- adaLN conditioning vector ``c = MLP(t_emb) + MLP(pooled)`` is computed
  once and broadcast into every block's modulation Dense — the same
  adaLN-Zero recipe as DiT (dmtpu/models/dit.py), whose zero-init makes
  every block an identity map at init (stable bf16 training from step 0).
- Per-head QK RMSNorm (f32 island) keeps attention logits bounded in bf16
  — the SD3.5 stabilization — behind ``qk_norm``.
- ``use_checkpoint`` remats per block like DiT; ``prefer_flash`` flips the
  attention dispatch for training graphs (see ops/attention.py).
- ``param_dtype=bfloat16`` stores the TORSO weights (blocks, embedders,
  final layer — ~99.8% of the count) in bf16, halving params+grads HBM:
  the lever that fits MMDiT-L/2 (the ~2B-param SD3-medium config) on one
  16 GB chip with adafactor (f32 params+grads alone are ~16.4 GB).  The
  conditioning MLPs and norm scales stay f32 (tiny, precision-sensitive).

Conditioning seam: ``y = {"context": [B, L, Dc], "pooled": [B, Dp]}`` — a
single pytree kwarg, so ``FlowMatchingCFG(cond_kwarg="y")`` (and the DDPM
CFG family) guide it with the stock 2B-batched merge, and the all-zeros
pytree from ``null_conditioning`` is the unconditional branch (the same
null the per-sample training dropout uses, keeping train/sample nulls
consistent).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmtpu.models.adm import timestep_embedding
from dmtpu.models.dit import (FinalLayer, TimmMlp, get_2d_sincos_pos_embed,
                              modulate)
from dmtpu.ops.attention import flash_mha

Array = jax.Array


class _QKNorm(nn.Module):
    """Per-head RMSNorm on q and k (f32 island, learned scale over head_dim)."""

    @nn.compact
    def __call__(self, q: Array, k: Array) -> Tuple[Array, Array]:
        dt = q.dtype
        norm_q = nn.RMSNorm(epsilon=1e-6, name="q_norm")
        norm_k = nn.RMSNorm(epsilon=1e-6, name="k_norm")
        return (norm_q(q.astype(jnp.float32)).astype(dt),
                norm_k(k.astype(jnp.float32)).astype(dt))


class MMDiTBlock(nn.Module):
    """One joint-attention block: separate context/image weights, ONE
    attention over the concatenated token sequence.

    ``context_pre_only`` (the final block): the context stream only
    produces q/k/v for the joint attention — its post-attention output is
    discarded, so the out-proj, MLP, and 4 of its 6 modulation chunks are
    never created (SD3's last block).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    context_pre_only: bool = False
    prefer_flash: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ctx: Array, x: Array, c: Array
                 ) -> Tuple[Optional[Array], Array]:
        d = x.shape[-1]
        hd = d // self.num_heads
        lc, lx = ctx.shape[1], x.shape[1]
        silu_c = jax.nn.silu(c)
        ln = lambda z: nn.LayerNorm(  # noqa: E731
            use_bias=False, use_scale=False, epsilon=1e-6)(z)
        zeros_dense = lambda n, name: nn.Dense(  # noqa: E731
            n, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        # per-stream adaLN-Zero modulation
        x_mod = zeros_dense(6 * d, "x_adaLN")(silu_c)
        xs_msa, xsc_msa, xg_msa, xs_mlp, xsc_mlp, xg_mlp = jnp.split(x_mod, 6, -1)
        if self.context_pre_only:
            c_mod = zeros_dense(2 * d, "ctx_adaLN")(silu_c)
            cs_msa, csc_msa = jnp.split(c_mod, 2, -1)
        else:
            c_mod = zeros_dense(6 * d, "ctx_adaLN")(silu_c)
            cs_msa, csc_msa, cg_msa, cs_mlp, csc_mlp, cg_mlp = jnp.split(c_mod, 6, -1)

        # per-stream qkv on the modulated tokens
        def qkv_of(tokens, shift, scale, name):
            h = modulate(ln(tokens), shift, scale)
            qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=self.param_dtype,
                           name=name)(h)
            qkv = qkv.reshape(tokens.shape[0], tokens.shape[1], 3, self.num_heads, hd)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        cq, ck, cv = qkv_of(ctx, cs_msa, csc_msa, "ctx_qkv")
        xq, xk, xv = qkv_of(x, xs_msa, xsc_msa, "x_qkv")
        if self.qk_norm:
            cq, ck = _QKNorm(name="ctx_qknorm")(cq, ck)
            xq, xk = _QKNorm(name="x_qknorm")(xq, xk)

        # THE MMDiT op: one fused attention over [context | image] tokens
        q = jnp.concatenate([cq, xq], axis=1)
        k = jnp.concatenate([ck, xk], axis=1)
        v = jnp.concatenate([cv, xv], axis=1)
        o = flash_mha(q, k, v, prefer_flash=self.prefer_flash)
        o = o.reshape(o.shape[0], lc + lx, d)
        c_att, x_att = o[:, :lc], o[:, lc:]

        # image stream: gated residuals (adaLN-Zero => identity at init)
        x = x + xg_msa[:, None] * nn.Dense(d, dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name="x_proj")(x_att)
        x = x + xg_mlp[:, None] * TimmMlp(int(d * self.mlp_ratio), dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name="x_mlp")(modulate(ln(x), xs_mlp, xsc_mlp))
        if self.context_pre_only:
            return None, x
        ctx = ctx + cg_msa[:, None] * nn.Dense(d, dtype=self.dtype,
                                               param_dtype=self.param_dtype,
                                               name="ctx_proj")(c_att)
        ctx = ctx + cg_mlp[:, None] * TimmMlp(int(d * self.mlp_ratio), dtype=self.dtype,
                                              param_dtype=self.param_dtype,
                                              name="ctx_mlp")(
            modulate(ln(ctx), cs_mlp, csc_mlp))
        return ctx, x


class MMDiT(nn.Module):
    """SD3-class rectified-flow transformer; NHWC latents in/out.

    Pairs with ``dmtpu.diffusions.FlowMatching`` (the model predicts
    velocity, ``out_channels == in_channels``) but the seam is the standard
    ``model(x, t, y)`` contract, so any sampler in the family drives it.
    """

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1536
    depth: int = 24
    num_heads: int = 24
    mlp_ratio: float = 4.0
    context_dim: int = 4096      # raw text-token width (e.g. T5-XXL 4096)
    pooled_dim: int = 2048       # pooled text vector width (CLIP-L+G 768+1280)
    cond_dropout_prob: float = 0.1
    qk_norm: bool = True
    pos_embed_max_size: Optional[int] = None
    use_checkpoint: Any = False
    prefer_flash: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def setup(self):
        p = self.patch_size
        self.x_proj = nn.Conv(self.hidden_size, (p, p), strides=p, padding=0,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="x_embedder")
        self.t_mlp0 = nn.Dense(self.hidden_size, name="t_mlp0")
        self.t_mlp2 = nn.Dense(self.hidden_size, name="t_mlp2")
        self.p_mlp0 = nn.Dense(self.hidden_size, name="pooled_mlp0")
        self.p_mlp2 = nn.Dense(self.hidden_size, name="pooled_mlp2")
        self.ctx_proj = nn.Dense(self.hidden_size, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="context_embedder")
        self.blocks = [
            MMDiTBlock(self.num_heads, self.mlp_ratio, qk_norm=self.qk_norm,
                       context_pre_only=(i == self.depth - 1),
                       prefer_flash=self.prefer_flash, dtype=self.dtype,
                       param_dtype=self.param_dtype, name=f"blocks__{i}")
            for i in range(self.depth)
        ]
        self.final = FinalLayer(p, self.in_channels, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="final_layer")

    def null_conditioning(self, batch: int, context_len: int,
                          dtype: Any = jnp.float32) -> Dict[str, Array]:
        """The all-zeros conditioning pytree — the SAME null the training
        dropout produces, for uncond sampling / CFG ``uncond_conditioning``.
        Widths come from THIS model's ``context_dim``/``pooled_dim``."""
        return {"context": jnp.zeros((batch, context_len, self.context_dim), dtype),
                "pooled": jnp.zeros((batch, self.pooled_dim), dtype)}

    def _condition(self, t: Array, y: Dict[str, Array], b: int, *,
                   train: bool, force_drop_rng: Optional[Array]
                   ) -> Tuple[Array, Array]:
        """(context tokens, adaLN vector c) with per-sample CFG dropout."""
        context, pooled = y["context"], y["pooled"]
        if train and self.cond_dropout_prob > 0 and force_drop_rng is not None:
            drop = jax.random.bernoulli(force_drop_rng, self.cond_dropout_prob, (b,))
            context = jnp.where(drop[:, None, None], 0.0, context)
            pooled = jnp.where(drop[:, None], 0.0, pooled)
        te = timestep_embedding(t, 256)
        te = self.t_mlp2(jax.nn.silu(self.t_mlp0(te)))
        pe = self.p_mlp2(jax.nn.silu(self.p_mlp0(pooled)))
        return self.ctx_proj(context), te + pe

    def __call__(self, x: Array, t: Array, y: Optional[Dict[str, Array]] = None,
                 *, train: bool = False,
                 force_drop_rng: Optional[Array] = None) -> Array:
        from dmtpu.ops.rematerialize import normalize_use_checkpoint

        if y is None:
            raise ValueError(
                "MMDiT needs y={'context': [B,L,Dc], 'pooled': [B,Dp]}; for "
                "the unconditional branch pass model.null_conditioning(...) "
                "(static context length required under jit)")
        # loud config-vs-data width check (Dense would otherwise fail deep
        # inside with an opaque kernel-shape error)
        if y["context"].shape[-1] != self.context_dim or \
                y["pooled"].shape[-1] != self.pooled_dim:
            raise ValueError(
                f"conditioning widths {y['context'].shape[-1]}/"
                f"{y['pooled'].shape[-1]} do not match the model's "
                f"context_dim={self.context_dim}/pooled_dim={self.pooled_dim}")
        b = x.shape[0]
        p = self.patch_size
        grid = self.input_size // p
        tokens = self.x_proj(x).reshape(b, grid * grid, self.hidden_size)
        if self.pos_embed_max_size is not None:
            # SD3 convention: the sincos table is laid out for the TRAINING
            # base grid (pos_embed_max_size) and the current grid reads the
            # CENTER crop — positions keep their absolute (offset) values, so
            # a converted SD3 checkpoint sees the embedding it was trained
            # with at any resolution <= base (sgm mmdit cropped_pos_embed).
            ms = self.pos_embed_max_size
            if grid > ms:
                raise ValueError(f"input grid {grid} exceeds "
                                 f"pos_embed_max_size {ms}")
            top = (ms - grid) // 2
            # per-position embedding: build ONLY the cropped window (the
            # full SD3-medium base table would be a ~450 MB f64 transient)
            crop = get_2d_sincos_pos_embed(self.hidden_size, grid, offset=top)
            pos = jnp.asarray(crop.reshape(1, grid * grid, self.hidden_size),
                              jnp.float32)
        else:
            pos = jnp.asarray(
                get_2d_sincos_pos_embed(self.hidden_size, grid)[None],
                jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        ctx, c = self._condition(t, y, b, train=train, force_drop_rng=force_drop_rng)

        ckpt, policy = normalize_use_checkpoint(self.use_checkpoint)
        for blk in self.blocks:
            if ckpt:
                ctx, tokens = nn.remat(
                    lambda m, cc, xx, vv: m(cc, xx, vv), policy=policy)(
                    blk, ctx, tokens, c)
            else:
                ctx, tokens = blk(ctx, tokens, c)

        tokens = self.final(tokens, c)
        out = tokens.reshape(b, grid, grid, p, p, self.in_channels)
        return jnp.einsum("nhwpqc->nhpwqc", out).reshape(
            b, grid * p, grid * p, self.in_channels)


# SD3 scaling rule: hidden = 64 * depth, heads = depth
# (MMDiT-L/2 at depth 24 is the SD3-medium 2B config).
MMDIT_CONFIGS = {
    "MMDiT-S/2": dict(depth=6, hidden_size=384, patch_size=2, num_heads=6),
    "MMDiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "MMDiT-L/2": dict(depth=24, hidden_size=1536, patch_size=2, num_heads=24),
    "MMDiT-XL/2": dict(depth=38, hidden_size=2432, patch_size=2, num_heads=38),
}


def mmdit_model(name: str, **kwargs) -> MMDiT:
    return MMDiT(**{**MMDIT_CONFIGS[name], **kwargs})
