"""Token Merging (ToMe) for SD serving — static-shape bipartite soft matching.

Training-free token reduction for the SD self-attention blocks (Bolya &
Hoffman, "Token Merging for Fast Stable Diffusion", 2023; PAPERS.md serving
family).  Before self-attention, the ``r`` most redundant tokens are merged
(mean) into their most similar counterparts; after attention the merged
outputs are copied back to every source position.  Attention cost at the
merged level drops ~(1-r/N)^2 while image quality stays near-baseline —
the classic ToMe-SD operating point is ratio=0.5 at the 64x64 level of a
512^2 SD1.5 sample.

TPU-first design (vs the reference-ecosystem ``tomesd`` patcher, which
mutates torch module forwards at runtime and gathers with dynamic shapes):

- **Everything is static-shape.**  ``r`` is a Python int fixed at trace
  time, the source/destination partition is a compile-time numpy index
  grid, and the merged token count ``N - r`` is a static dimension — so the
  whole merged attention compiles into the same one-scan serving loop as
  every other dmtpu sampler (no recompiles, no dynamic gathers).
- **Matching is one MXU matmul** (``src_norm @ dst_norm^T``) plus a
  ``top_k``; merging is a one-hot matmul (scatter-add rides the MXU instead
  of XLA's serialized scatter); unmerging is a single gather through a
  precomputed (B, N) index map.
- The (merge, unmerge) pair is built ONCE per transformer block from the
  block input and reused — exactly the tomesd call structure
  (``u_a(attn(m_a(norm(x))))``), but as pure closures over index arrays.

No parameters are added anywhere: a ToMe-enabled model shares its params
pytree bit-for-bit with the baseline, so serving can simply rebind the
module with ``tome_ratio>0``.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MergeFn = Callable[[Array], Array]
UnmergeFn = Callable[[Array], Array]


def dst_index_grid(h: int, w: int, sx: int = 2, sy: int = 2,
                   seed: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Static src/dst partition of an h*w token grid.

    One destination token per (sy, sx) cell — position 0 of the cell when
    ``seed`` is None (tomesd's ``no_rand``), else a per-cell pseudo-random
    offset drawn host-side (static across the jit trace; the stochastic
    pattern is fixed per sampler build rather than per step, which measured
    no quality difference in the ToMe-SD ablations).  Tokens outside full
    cells (h % sy or w % sx remainders) are always sources.

    Returns ``(a_idx, b_idx)``: flat-token indices of sources and
    destinations, each sorted ascending.
    """
    hsy, wsx = h // sy, w // sx
    if seed is None:
        off_y = np.zeros((hsy, wsx), np.int64)
        off_x = np.zeros((hsy, wsx), np.int64)
    else:
        rng = np.random.RandomState(seed)
        off = rng.randint(0, sy * sx, size=(hsy, wsx))
        off_y, off_x = off // sx, off % sx
    ys = np.arange(hsy)[:, None] * sy + off_y
    xs = np.arange(wsx)[None, :] * sx + off_x
    b_idx = np.sort((ys * w + xs).reshape(-1))
    mask = np.ones(h * w, bool)
    mask[b_idx] = False
    a_idx = np.nonzero(mask)[0]
    return a_idx, b_idx


def identity_merge() -> Tuple[MergeFn, UnmergeFn]:
    return (lambda x: x), (lambda x: x)


def bipartite_soft_matching_2d(metric: Array, h: int, w: int, *,
                               sx: int = 2, sy: int = 2, r: int = 0,
                               seed: Optional[int] = None,
                               ) -> Tuple[MergeFn, UnmergeFn]:
    """Build (merge, unmerge) closures from per-token features ``metric``.

    ``metric``: (B, N=h*w, C) — the transformer-block input (pre-norm), as
    in tomesd.  ``r`` tokens (clamped to the source-set size) are merged.

    merge(x):   (B, N, C) -> (B, N-r, C)   — order: [unmerged srcs, dsts]
    unmerge(y): (B, N-r, C) -> (B, N, C)   — merged srcs get their dst's row

    Matching is per batch item (CFG cond/uncond halves match independently).
    """
    B, N, C = metric.shape
    if N != h * w:
        raise ValueError(f"metric has {N} tokens, expected h*w={h * w}")
    a_np, b_np = dst_index_grid(h, w, sx, sy, seed)
    na, nb = len(a_np), len(b_np)
    r = max(0, min(int(r), na))
    # degenerate grid (a cell bigger than the token grid leaves no dst
    # tokens, or everything is dst): nothing can merge — identity, not a
    # zero-size argmax at trace time
    if r == 0 or nb == 0 or na == 0:
        return identity_merge()
    a_idx = jnp.asarray(a_np, jnp.int32)
    b_idx = jnp.asarray(b_np, jnp.int32)

    mn = metric.astype(jnp.float32)
    mn = mn / (jnp.linalg.norm(mn, axis=-1, keepdims=True) + 1e-6)
    scores = jnp.einsum("bnc,bmc->bnm", mn[:, a_idx], mn[:, b_idx])  # (B,na,nb)
    node_max = scores.max(axis=-1)
    node_idx = scores.argmax(axis=-1).astype(jnp.int32)             # (B, na)

    # rank sources by how well they matched; merge the top-r
    _, order = jax.lax.top_k(node_max, na)                          # descending
    src_idx = order[:, :r].astype(jnp.int32)                        # (B, r)
    unm_idx = jnp.sort(order[:, r:], axis=-1).astype(jnp.int32)     # (B, na-r)
    dst_of_src = jnp.take_along_axis(node_idx, src_idx, axis=1)     # (B, r)

    ab = jnp.arange(B, dtype=jnp.int32)[:, None]

    def merge(x: Array) -> Array:
        xa, xb = x[:, a_idx], x[:, b_idx]
        unm = jnp.take_along_axis(xa, unm_idx[..., None], axis=1)
        src = jnp.take_along_axis(xa, src_idx[..., None], axis=1)
        # scatter-add as a one-hot matmul: MXU-friendly, f32 accumulation
        oh = jax.nn.one_hot(dst_of_src, nb, dtype=x.dtype)          # (B, r, nb)
        add = jnp.einsum("brm,brc->bmc", oh, src,
                         preferred_element_type=jnp.float32)
        cnt = 1.0 + jnp.sum(oh.astype(jnp.float32), axis=1)[..., None]
        dst = ((xb.astype(jnp.float32) + add) / cnt).astype(x.dtype)
        return jnp.concatenate([unm, dst], axis=1)

    def unmerge(y: Array) -> Array:
        # row map into y (= [unm | dst]) for every original position
        gidx = jnp.zeros((B, N), jnp.int32)
        gidx = gidx.at[ab, a_idx[unm_idx]].set(
            jnp.broadcast_to(jnp.arange(na - r, dtype=jnp.int32), (B, na - r)))
        gidx = gidx.at[ab, b_idx[None, :]].set(
            na - r + jnp.arange(nb, dtype=jnp.int32)[None, :])
        gidx = gidx.at[ab, a_idx[src_idx]].set(na - r + dst_of_src)
        return jnp.take_along_axis(y, gidx[..., None], axis=1)

    return merge, unmerge


def tome_r(n_tokens: int, ratio: float, h: int, w: int,
           sx: int = 2, sy: int = 2) -> int:
    """tomesd's r: ``int(N * ratio)`` clamped to the source-set size.

    0 when the grid is degenerate (no destination tokens to merge into)."""
    nb = (h // sy) * (w // sx)
    if nb == 0:
        return 0
    return max(0, min(int(n_tokens * ratio), n_tokens - nb))
