"""Sequence/context parallelism: ring attention over a mesh axis.

Beyond-parity (the reference is DP-only — SURVEY.md §2d; its xformers
attention is single-GPU): at high resolution the attention sequence grows
quadratically (SD 1024² -> S=16384) and one chip's HBM caps both the KV
tensors and the O(S²/blocks) flash workspace.  Sequence parallelism shards
the TOKEN dimension across chips, which composes with data parallelism on
the standard (data, fsdp) mesh — the fsdp axis doubles as the context axis,
the same way ``parallel/tp.py`` reuses it as the tensor axis.

The kernel is RING attention (Liu et al. 2023, arXiv:2310.01889): each
device holds Q/K/V shards of S/n tokens; K/V chunks rotate around the ring
via ``lax.ppermute`` (neighbour ICI hops — no all-gather memory spike)
while a running online-softmax accumulator (the flash-attention recurrence:
running max m, normaliser l, unnormalised output o) folds in one chunk per
step.  n-1 hops see every token; memory stays O(S/n), and XLA overlaps the
ppermute with the einsums.  The per-chunk body is ``jax.checkpoint``-ed so
the backward recomputes chunk logits instead of saving n of them.

Numerics: logits and the accumulator run in f32 regardless of input dtype
(matching ``dmtpu.ops.attention``'s f32-softmax islands); output is cast
back to the input dtype.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmtpu.parallel.mesh import FSDP_AXIS

Array = jax.Array


def _ring_attention_local(q: Array, k: Array, v: Array, axis_name: str,
                          scale: float) -> Array:
    """Per-shard body under shard_map: q/k/v are local [B, S/n, H, D]."""
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32)
    b, sq, h, d = q.shape

    def chunk(carry, kc, vc):
        m, l, o = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kc.astype(jnp.float32)) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vc.astype(jnp.float32))
        return m_new, l, o

    chunk = jax.checkpoint(chunk)

    def body(carry, _):
        kc, vc, acc = carry
        acc = chunk(acc, kc, vc)
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        return (kc, vc, acc), None

    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    o0 = jnp.zeros((b, h, sq, d), jnp.float32)
    # non-causal: every chunk contributes fully, visit order irrelevant
    (_, _, (m, l, o)), _ = lax.scan(body, (k, v, (m0, l0, o0)), None, length=n)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def sp_attention(q: Array, k: Array, v: Array, mesh: Mesh,
                 axis: str = FSDP_AXIS, scale: Optional[float] = None) -> Array:
    """Sequence-parallel MHA: [B, S, H, D] x3 -> [B, S, H, D].

    The sequence dim is sharded over ``mesh`` axis ``axis`` (the inputs are
    re-placed here if needed); batch/head dims stay as the caller sharded
    them.  Differentiable — the VJP rides the transposed ring.
    """
    n = mesh.shape[axis]
    s = q.shape[1]
    if s % n != 0:
        raise ValueError(f"sequence {s} not divisible by mesh axis '{axis}'={n}")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, axis, None, None)
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(t, sharding) for t in (q, k, v))
    inner = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return inner(q, k, v)
