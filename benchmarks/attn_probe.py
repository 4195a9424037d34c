"""Probe: training-path attention alternatives at SD1.5's head shapes.

The SD training ceiling decomposition (docs/ROADMAP.md) puts 76% of the
train step in the SpatialTransformers at ~13% MFU — the d=40 structural
penalty: the Pallas flash kernel pads head_dim 40->128 in BOTH the forward
and the ~2x-flops backward, while the XLA one-shot path (which handles d=40
at ~25% MFU) cannot be used for training because its backward materialises
the full f32 S x S logits (8 GB at b16 h8 S4096).

Candidate measured here: CHUNKED attention — the flash recurrence (online
softmax over KV chunks) written in plain lax.scan + einsum so XLA's matmul
emitter (better at d=40 than Mosaic's 128-lane padding) does the work, with
jax.checkpoint on the chunk body so the backward recomputes chunk logits
instead of saving S x S.  Memory: O(S * chunk) per step, same class as
flash.

Usage: python benchmarks/attn_probe.py [shape...]   (never under pytest)
Prints one JSON line per (shape, impl, direction).

Timing discipline (axon tunnel): N iterations inside ONE jit via lax.scan
with a data dependency, minus the empty-loop floor, host-synced via
float(sum); best of 3 reps.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dmtpu.ops.attention import flash_mha, mha  # noqa: E402


def chunked_mha(q, k, v, scale=None, chunk=1024):
    """Flash-style online-softmax attention as a lax.scan over KV chunks.

    [B, S, H, D] layout (matching dmtpu.ops.attention).  f32 logits and
    accumulators; per-chunk body is checkpointed so the backward recomputes
    the chunk logits (no S x S residual).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    n = max(1, sk // chunk)
    while sk % n:
        n -= 1
    c = sk // n
    qf = q.astype(jnp.float32)
    kc = k.reshape(b, n, c, h, d).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(b, n, c, h, d).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def body(carry, kv):
        m, l, o = carry
        kci, vci = kv
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kci.astype(jnp.float32)) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p,
                                             vci.astype(jnp.float32))
        return (m_new, l, o), None

    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    o0 = jnp.zeros((b, h, sq, d), jnp.float32)
    (m, l, o), _ = lax.scan(body, (m0, l0, o0), (kc, vc))
    return (o / l[..., None]).transpose(0, 2, 1, 3).astype(q.dtype)


def _timed(fn, args, iters=30, reps=3):
    """Best-of-reps seconds per call: `iters` dependent calls in one jit,
    minus an empty-loop floor measured the same way."""

    def loop(qq, kk, vv):
        def body(carry, _):
            out = fn(carry, kk, vv)
            # feed the output back (scaled to avoid blowup) for a data dep
            return qq + 1e-3 * out, None

        final, _ = lax.scan(body, qq, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    def floor_loop(qq, kk, vv):
        def body(carry, _):
            return qq + 1e-3 * carry, None

        final, _ = lax.scan(body, qq, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    jl = jax.jit(loop)
    jf = jax.jit(floor_loop)
    float(jl(*args))
    float(jf(*args))
    best = float("inf")
    floor = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jl(*args))
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jf(*args))
        floor = min(floor, time.perf_counter() - t0)
    return max(best - floor, 0.0) / iters


def _timed_grad(fn, args, iters=10, reps=3):
    """Same, for value_and_grad of mean(fn) w.r.t. q,k,v."""

    def one(qq, kk, vv):
        return jnp.mean(fn(qq, kk, vv).astype(jnp.float32))

    g = jax.grad(one, argnums=(0, 1, 2))

    def loop(qq, kk, vv):
        def body(carry, _):
            dq, dk, dv = g(carry, kk, vv)
            return qq + 1e-3 * dq, None

        final, _ = lax.scan(body, qq, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    def floor_loop(qq, kk, vv):
        def body(carry, _):
            return qq + 1e-3 * carry, None

        final, _ = lax.scan(body, qq, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    jl = jax.jit(loop)
    jf = jax.jit(floor_loop)
    float(jl(*args))
    float(jf(*args))
    best = float("inf")
    floor = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jl(*args))
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jf(*args))
        floor = min(floor, time.perf_counter() - t0)
    return max(best - floor, 0.0) / iters


def attn_gflops(b, s, h, d):
    return 2 * 2 * b * h * s * s * d / 1e9  # QK^T + PV, fwd


def probe(b, s, h, d, dtype=jnp.bfloat16, which=("xla", "flash", "chunked"),
          grad_which=("flash", "chunked"), chunk=1024, bq=512, bk=1024):
    from dmtpu.ops.flash_small_d import flash_small_d_bshd

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, s, h, d), dtype)
    v = jax.random.normal(kv, (b, s, h, d), dtype)
    fwd_gf = attn_gflops(b, s, h, d)
    impls = {
        "xla": lambda a, bb, c: mha(a, bb, c),
        "flash": lambda a, bb, c: flash_mha(a, bb, c, prefer_flash=True),
        "chunked": lambda a, bb, c: chunked_mha(a, bb, c, chunk=chunk),
        f"smalld_q{bq}k{bk}": lambda a, bb, c: flash_small_d_bshd(
            a, bb, c, d ** -0.5, block_q=bq, block_k=bk),
    }
    # correctness at a SMALL shape (an eager full-shape check would hold the
    # f32 S x S logits un-jitted -> OOM at b16 S4096)
    qs, ks, vs = (t[:2, :1024] for t in (q, k, v))
    ref = jax.jit(mha)(qs, ks, vs)
    for name in which:
        if name == "xla":
            continue
        err = float(jnp.abs(jax.jit(impls[name])(qs, ks, vs).astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        assert err < 0.02, (name, err)
    del ref, qs, ks, vs
    for name in which:
        dt = _timed(impls[name], (q, k, v))
        print(json.dumps({
            "shape": f"b{b}_s{s}_h{h}_d{d}", "impl": name, "dir": "fwd",
            "ms": round(dt * 1e3, 3),
            "mfu": round(fwd_gf / dt / 1e3 / 197.0, 3),
        }), flush=True)
    for name in grad_which:
        dt = _timed_grad(impls[name], (q, k, v))
        print(json.dumps({
            "shape": f"b{b}_s{s}_h{h}_d{d}", "impl": name, "dir": "fwd+bwd",
            "ms": round(dt * 1e3, 3),
            "mfu_3x": round(3 * fwd_gf / dt / 1e3 / 197.0, 3),
        }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ldm0"):
        # SD1.5 level-0 self-attention: the dominant training shape
        probe(16, 4096, 8, 40)
    if which in ("all", "ldm1"):
        probe(16, 1024, 8, 80, grad_which=("xla", "flash", "chunked"))
    if which == "ldm0c512":
        probe(16, 4096, 8, 40, which=("chunked",), grad_which=("chunked",),
              chunk=512)
    if which == "ldm0c2048":
        probe(16, 4096, 8, 40, which=("chunked",), grad_which=("chunked",),
              chunk=2048)
    if which == "sdxl":
        probe(1, 4096, 10, 64, grad_which=("xla", "flash", "chunked"))
    # --- flash_small_d (round 4): the fused small-d kernel, block sweep ---
    if which.startswith("smalld0"):  # level-0 shape; smalld0_BQ_BK
        _, bq, bk = (which.split("_") + ["512", "1024"])[:3]
        nm = f"smalld_q{int(bq)}k{int(bk)}"
        probe(16, 4096, 8, 40, which=("xla", "flash", nm),
              grad_which=("flash", nm), bq=int(bq), bk=int(bk))
    if which.startswith("smalld1"):  # level-1 shape (d=80); smalld1_BQ_BK
        _, bq, bk = (which.split("_") + ["512", "1024"])[:3]
        nm = f"smalld_q{int(bq)}k{int(bk)}"
        probe(16, 1024, 8, 80, which=("xla", "flash", nm),
              grad_which=("flash", nm), bq=int(bq), bk=int(bk))
    # --- MMDiT-B/2 joint attention (round 5): [ctx 77 | image 256] = S 333,
    # h=12, d=64, at the measured-best train batch.  The ragged S=333 is not
    # 8-sublane aligned; the 384 variant quantifies what padding to the next
    # lane-aligned length would buy (if XLA's padded matmuls at 384 run
    # enough faster to cover the +33% flops, pad; else the gap is
    # elsewhere). XLA-only: the flash gates reject S%128!=0 here anyway.
    if which == "mmditb":
        probe(128, 333, 12, 64, which=("xla",), grad_which=("xla",))
    if which == "mmditb384":
        probe(128, 384, 12, 64, which=("xla",), grad_which=("xla",))
