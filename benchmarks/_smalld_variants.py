"""Scratch A/B variants of dmtpu.ops.flash_small_d (round-4 kernel tuning).

Two hypotheses for closing the forward gap (measured on chip: smalld fwd
10.3 ms vs stock flash 8.8 ms vs XLA 6.5 ms at b16 h8 S4096 d40, while the
fused smalld BACKWARD wins 16.8 ms vs stock's 24.1 ms):

1. ``sem``   — identical kernels, but the pallas_call carries
   ``dimension_semantics`` grid annotations (the stock kernel marks its grid
   dims "parallel"; ours defaults to "arbitrary", which can serialise the
   grid pipeline and block DMA/compute overlap).
   fwd grid (bh, nq): both parallel (K/V revisit is a read-only input).
   bwd grid (bh, nk): bh parallel, nk arbitrary (dq block is a revisited
   accumulator across the k sweep — must stay sequential).

2. ``hybrid`` — stock Pallas flash forward (save_residuals=True for the
   l/m row stats -> lse) + our fused single-kernel backward.  Best measured
   fwd (8.8) + best measured bwd (16.8) if the stitching costs nothing.

Usage (never under pytest; one TPU process at a time):
    python benchmarks/_smalld_variants.py            # chip timing A/B
    python benchmarks/_smalld_variants.py check      # CPU interpret numerics
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dmtpu.ops import flash_small_d as fsd  # noqa: E402


# ---------------------------------------------------------------------------
# variant 1: dimension_semantics
# ---------------------------------------------------------------------------


def _fwd_sem(q, k, v, scale, block_q, block_k):
    bh, s, d = q.shape
    grid = (bh, s // block_q)
    out, lse = pl.pallas_call(
        functools.partial(fsd._fwd_kernel, scale=scale, block_k=block_k),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q, k, v)
    return out, lse[:, 0, :]


def _bwd_sem(scale, block_q, block_k, res, do):
    q, k, v, o, lse = res
    bh, s, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]
    grid = (bh, s // block_k)
    dq, dk, dv = pl.pallas_call(
        functools.partial(fsd._bwd_kernel, scale=scale, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, s, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(q, k, v, do, lse[:, None, :], delta)
    return dq.astype(q.dtype), dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def smalld_sem(q, k, v, scale, block_q=512, block_k=1024):
    out, _ = _fwd_sem(q, k, v, scale, block_q, block_k)
    return out


def _sem_f(q, k, v, scale, block_q, block_k):
    out, lse = _fwd_sem(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


smalld_sem.defvjp(_sem_f, _bwd_sem)


# ---------------------------------------------------------------------------
# variant 2: stock flash fwd + fused bwd
# ---------------------------------------------------------------------------


def _fwd_stock(q, k, v, scale, block_q, block_k):
    """Stock Pallas flash forward with residuals; [BH, S, D] like ours."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    bh, s, d = q.shape
    q4, k4, v4 = (x[:, None] for x in (q, k, v))  # [BH, 1, S, D]
    o, l, m = fa._flash_attention_impl(
        q4, k4, v4, None, None, True, False, scale,
        1, block_q, block_k, block_k, False)
    lse = m[:, 0, :] + jnp.log(l[:, 0, :])
    return o[:, 0], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def smalld_hybrid(q, k, v, scale, block_q=512, block_k=1024):
    out, _ = _fwd_stock(q, k, v, scale, block_q, block_k)
    return out


def _hyb_f(q, k, v, scale, block_q, block_k):
    out, lse = _fwd_stock(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _hyb_b(scale, block_q, block_k, res, do):
    # fused backward expects the same residual tuple; reuse the sem variant's
    # bwd (annotated) — stitching question is whether lse layouts agree.
    return _bwd_sem(scale, block_q, block_k, res, do)


smalld_hybrid.defvjp(_hyb_f, _hyb_b)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _dense(q, k, v, scale):
    lg = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(lg, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32))


def check():
    """CPU interpret-mode numerics for both variants (fwd + all grads)."""
    cpu = jax.devices("cpu")[0]
    key = jax.random.PRNGKey(0)
    bh, s, d = 4, 512, 40
    scale = d ** -0.5
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (bh, s, d), jnp.float32)
    k = jax.random.normal(kk, (bh, s, d), jnp.float32)
    v = jax.random.normal(kv, (bh, s, d), jnp.float32)
    with jax.default_device(cpu), pltpu.force_tpu_interpret_mode():
        want = _dense(q, k, v, scale)
        gw = jax.grad(lambda *a: jnp.mean(_dense(*a, scale) ** 2), (0, 1, 2))(
            q, k, v)
        for name, fn in [("sem", smalld_sem)]:
            got = fn(q, k, v, scale, 128, 256)
            err = float(jnp.abs(got - want).max())
            gg = jax.grad(lambda *a: jnp.mean(fn(*a, scale, 128, 256) ** 2),
                          (0, 1, 2))(q, k, v)
            gerr = max(float(jnp.abs(a - b).max()) for a, b in zip(gg, gw))
            print(f"{name}: fwd_err={err:.2e} grad_err={gerr:.2e}")
            assert err < 1e-5 and gerr < 1e-5, name
    # hybrid's stock fwd cannot run in interpret mode off-TPU reliably; its
    # numerics are checked on chip in main() against the dense path.
    print("check OK")


def main():
    import attn_probe as ap

    b, s, h, d = 16, 4096, 8, 40
    scale = d ** -0.5
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b * h, s, d)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    impls = {
        "base": lambda a, bb, c: fsd.flash_small_d(a, bb, c, scale),
        "sem": lambda a, bb, c: smalld_sem(a, bb, c, scale),
        "hybrid": lambda a, bb, c: smalld_hybrid(a, bb, c, scale),
    }
    # numerics on chip first (hybrid esp.) — small bh slice so the dense
    # reference's S×S logits fit (full b·h=128 would be 8.6 GB f32: OOM)
    qs, ks, vs = q[:8], k[:8], v[:8]
    want = _dense(qs, ks, vs, scale).astype(jnp.bfloat16)
    for name, fn in impls.items():
        got = fn(qs, ks, vs)
        err = float(jnp.abs(got.astype(jnp.float32)
                            - want.astype(jnp.float32)).max())
        print(json.dumps({"impl": name, "chip_fwd_err": round(err, 5)}),
              flush=True)
        assert err < 0.05, (name, err)

    flops_fwd = 4.0 * b * h * s * s * d
    for name, fn in impls.items():
        dt = ap._timed(fn, (q, k, v))
        print(json.dumps({
            "shape": f"b{b}_s{s}_h{h}_d{d}", "impl": name, "dir": "fwd",
            "ms": round(dt * 1e3, 3),
            "mfu": round(flops_fwd / dt / 1e12 / 197.0, 3)}), flush=True)
    for name, fn in impls.items():
        dt = ap._timed_grad(fn, (q, k, v))
        print(json.dumps({
            "shape": f"b{b}_s{s}_h{h}_d{d}", "impl": name, "dir": "fwd+bwd",
            "ms": round(dt * 1e3, 3),
            "mfu_3x": round(3 * flops_fwd / dt / 1e12 / 197.0, 3)}),
            flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        main()
