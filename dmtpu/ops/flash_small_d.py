"""Flash attention specialized for LDM small head dims (d=40/80, SD1.5).

Why this kernel exists (measured, docs/ROADMAP.md "SD training ceiling
decomposition"): SD1.5's 16 SpatialTransformers are 76% of the training step
at ~13% MFU.  Any TPU kernel pays the structural d<128 MXU padding (the
128-lane contraction means a d=40 matmul performs 3.2x its useful flops —
head-packing/block-diagonal layouts provably cost the same MXU passes), but
the stock Pallas flash kernel leaves time on the table on top of that wall:

- its backward is TWO kernels (dq, dkv) that each recompute the attention
  matrix and dP — 7 [bq x bk] matmuls per block pair vs the fused minimum 5;
- backward blocks are capped at 256 by Mosaic layout pressure, multiplying
  HBM re-reads of Q/dO/K/V;
- generic machinery (segment ids, ab masks, causal paths) bloats the body.

This kernel is lean and fused: non-causal, no masking, S_q == S_k multiple of
the q block, d <= 128.  Forward keeps K/V resident in VMEM per (b*h) row and
emits the row logsumexp; backward is ONE kernel per (b*h, k-block) computing
dK/dV for its block while accumulating the FULL dQ [S, d] in a revisited VMEM
output block (grid-minor k iteration -> Mosaic never spills it to HBM between
k steps) — the 5-matmul minimum per block pair.

Shapes are [BH, S, D] (batch*heads flattened; callers reshape).  Matmul
accumulation f32 (preferred_element_type); softmax math f32; P is cast to the
V dtype for the PV/dV matmuls (bf16 MXU when the torso is bf16).

reference: models/stablediffusion/attention.py:89-188 is the torch module
whose self-attention this serves; the reference relies on xformers for the
same role.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k):
    # q: [bq, d]  k/v: [S, d] (full row resident)  o: [bq, d]  lse: [1, bq]
    bq, d = q_ref.shape[-2], q_ref.shape[-1]
    s_k = k_ref.shape[-2]
    nk = s_k // block_k

    q = q_ref[0]  # [bq, d]

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]  # [bk, d]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[:, 0][None, :]


def _fwd(q, k, v, scale, block_q, block_k):
    bh, s, d = q.shape
    if not supported(s, k.shape[-2], d, block_q, block_k):
        raise ValueError(
            f"flash_small_d needs S_q == S_k, D <= 128 and S divisible by "
            f"both blocks; got S_q={s}, S_k={k.shape[-2]}, D={d}, "
            f"block_q={block_q}, block_k={block_k} (check supported())")
    grid = (bh, s // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
        ],
    )(q, k, v)
    return out, lse[:, 0, :]


# ---------------------------------------------------------------------------
# backward: one fused kernel.  grid = (bh, nk) with k minor so the dq output
# block (index_map ignores the k position) is revisited — it lives in VMEM
# across the whole k sweep of one bh row and is written to HBM once.
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale, block_q):
    # q/do: [S, d] full row   k/v: [bk, d] this block   lse/delta: [1, S]
    # dq: [S, d] (revisited accumulator)   dk/dv: [bk, d]
    s_q, d = q_ref.shape[-2], q_ref.shape[-1]
    bk = k_ref.shape[-2]
    nq = s_q // block_q

    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    kb = k_ref[0]  # [bk, d]
    vb = v_ref[0]

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block_q, block_q), :]      # [bq, d]
        doi = do_ref[0, pl.ds(i * block_q, block_q), :]    # [bq, d]
        lsei = lse_ref[0, 0, pl.ds(i * block_q, block_q)]  # [bq]
        deltai = delta_ref[0, 0, pl.ds(i * block_q, block_q)]

        s = jax.lax.dot_general(
            qi, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [bq, bk]
        p = jnp.exp(s - lsei[:, None])                      # [bq, bk]
        pt = p.astype(doi.dtype)
        dv = dv + jax.lax.dot_general(
            pt, doi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, d]
        dp = jax.lax.dot_general(
            doi, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bq, bk]
        ds = (p * (dp - deltai[:, None]) * scale).astype(qi.dtype)
        dk = dk + jax.lax.dot_general(
            ds, qi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, d]
        dqi = jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bq, d]
        dq_ref[0, pl.ds(i * block_q, block_q), :] += dqi.astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, res, do):
    q, k, v, o, lse = res
    bh, s, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [bh, 1, s]
    grid = (bh, s // block_k)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # q
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # v
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # do
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),        # lse
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),        # delta
        ],
        out_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # dq
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # dk
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # dv
        ],
        out_shape=[
            # dq is a revisited accumulator summed over nk k-blocks: keep it
            # f32 in VMEM (bf16 read-modify-write would round every partial
            # sum) and cast once at the end, matching the dk/dv carries.
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, s, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        ],
    )(q, k, v, do, lse[:, None, :], delta)
    return dq.astype(q.dtype), dk, dv


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_small_d(q: Array, k: Array, v: Array, scale: float,
                  block_q: int = 512, block_k: int = 1024) -> Array:
    """Fused self-attention for [BH, S, D] with small D; returns [BH, S, D].

    Constraints (validated at trace time; query ``supported`` to pre-check):
    S % block_q == 0, S % block_k == 0, D <= 128, non-causal, S_q == S_k.
    """
    out, _ = _fwd(q, k, v, scale, block_q, block_k)
    return out


def _vjp_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _fwd(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, block_q, block_k, res, g):
    return _bwd(scale, block_q, block_k, res, g)


flash_small_d.defvjp(_vjp_fwd, _vjp_bwd)


def supported(s_q: int, s_k: int, d: int,
              block_q: int = 512, block_k: int = 1024) -> bool:
    return (s_q == s_k and d <= 128
            and s_q % block_q == 0 and s_q % block_k == 0)


def flash_small_d_bshd(q: Array, k: Array, v: Array, scale: float,
                       block_q: int = 512, block_k: int = 1024) -> Array:
    """[B, S, H, D] wrapper: flatten heads into the row axis and back."""
    b, s, h, d = q.shape

    def flat(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)

    out = flash_small_d(flat(q), flat(k), flat(v), scale, block_q, block_k)
    return jnp.swapaxes(out.reshape(b, h, s, d), 1, 2)
