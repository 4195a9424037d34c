"""Pallas-kernel ops: numerical parity with XLA references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmtpu.ops.groupnorm import group_norm_silu, group_norm_silu_reference


@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_silu_matches_flax(silu):
    """Reference path == flax GroupNorm (+ silu)."""
    from flax import linen as nn

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 128).astype(np.float32))
    scale = jnp.asarray(rs.randn(128).astype(np.float32))
    bias = jnp.asarray(rs.randn(128).astype(np.float32))

    got = group_norm_silu_reference(x, scale, bias, groups=32, silu=silu)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    if silu:
        want = want * jax.nn.sigmoid(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_grad():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 4, 128).astype(np.float32))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, 32) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_silu_reference(x, s, b, 32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_pallas_interpret():
    """Run the actual pallas kernel in interpreter mode and compare."""
    from jax.experimental.pallas import tpu as pltpu

    from dmtpu.ops import groupnorm

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 4, 4, 128).astype(np.float32))
    scale = jnp.asarray(rs.randn(128).astype(np.float32))
    bias = jnp.asarray(rs.randn(128).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = groupnorm._pallas_forward(x, scale, bias, 32, 1e-5, True)
    want = group_norm_silu_reference(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_gn_unet_matches_standard():
    """UNet(fused_gn=True) == UNet(fused_gn=False) with identical params."""
    import jax
    import jax.numpy as jnp

    from dmtpu.models import UNet

    m0 = UNet(dim=32, dim_mults=(1, 2), use_attn=(False, True), num_res_blocks=1, dropout=0.0)
    m1 = UNet(dim=32, dim_mults=(1, 2), use_attn=(False, True), num_res_blocks=1, dropout=0.0,
              fused_gn=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    t = jnp.asarray([3, 9])
    p = m0.init(jax.random.PRNGKey(1), x, t)
    out0 = m0.apply(p, x, t)
    out1 = m1.apply(p, x, t)  # same params tree (scale/bias names match)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=2e-5, atol=2e-5)


def test_converter_pads_null_class_row():
    """A reference-sized class embedding (no null row) loads with zero pad."""
    import jax
    import jax.numpy as jnp

    from dmtpu.convert import convert_by_structure
    from dmtpu.models import UNetCategorialAdaGN

    model = UNetCategorialAdaGN(dim=32, dim_mults=(1, 2), use_attn=(False, False), num_classes=4)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    # round-trip our own params into a torch-style dict with 4 rows (no null)
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                flat[name] = np.asarray(v)

    walk(init["params"])
    sd = {}
    for k, v in flat.items():
        tk = k.replace("__", ".")
        if tk.endswith(".kernel"):
            base = tk[: -len(".kernel")]
            sd[base + ".weight"] = np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v.T
        elif tk.endswith(".scale"):
            sd[tk[: -len(".scale")] + ".weight"] = v
        elif tk.endswith(".embedding"):
            sd[tk[: -len(".embedding")] + ".weight"] = v[:-1]  # drop the null row
        else:
            sd[tk.replace(".bias", "") + ".bias"] = v
    params = convert_by_structure(sd, init)
    emb = np.asarray(params["params"]["class_embed"]["embedding"])
    assert emb.shape[0] == 5
    np.testing.assert_array_equal(emb[-1], 0)


def test_flash_mha_lowers_at_non_power_of_two_seq():
    """Regression: tuned BlockSizes must divide the sequence — S=1536 passes
    the %128 gate but is not a multiple of the 1024 k-block (SD page at
    640²→80×80 tokens etc.); lowering used to raise at trace time."""
    from dmtpu.ops.attention import flash_mha

    for s in (1536, 2304, 6400):
        q = jnp.zeros((1, s, 8, 64), jnp.float32)
        jax.jit(flash_mha).lower(q, q, q)  # both platform branches trace


def test_flash_gate_long_sequences_never_fall_back():
    """Regression: the d<64 XLA-wins heuristic (measured at S=4096) must not
    force the S×S-materialising path at very long sequences (SD1.5 at 1024²:
    S=16384, d=40, b·h=128 → ~137 GB f32 logits)."""
    from dmtpu.ops.attention import _should_use_flash

    assert not _should_use_flash(16, 4096, 4096, 8, 40)   # measured XLA win
    assert _should_use_flash(16, 16384, 16384, 8, 40)     # must take flash
    assert _should_use_flash(4, 4096, 4096, 8, 40)        # few rows: flash
    assert not _should_use_flash(1, 512, 512, 8, 64)      # short: XLA


def test_flash_gate_prefer_flash_for_training():
    """Training graphs must be able to force the flash kernel past the
    XLA-beats-flash heuristic: differentiating the XLA path materialises the
    full f32 S×S logits in the backward (8 GB at b16·h8·S4096 — OOM on one
    v5e; hit by the round-3 SD1.5 b16 train step)."""
    from dmtpu.ops.attention import _should_use_flash

    # the exact OOM shape: heuristic says XLA for inference, flash for training
    assert not _should_use_flash(16, 4096, 4096, 8, 40)
    assert _should_use_flash(16, 4096, 4096, 8, 40, prefer_flash=True)
    # prefer_flash never overrides the hard shape constraints
    assert not _should_use_flash(1, 512, 512, 8, 64, prefer_flash=True)
    assert not _should_use_flash(1, 4096, 4096, 8, 16, prefer_flash=True)


def test_flash_mha_differentiable():
    """Regression: training through flash attention requires the BACKWARD
    block sizes too — jax.grad used to fail at trace time ('not all backward
    blocks are specified')."""
    from dmtpu.ops.attention import flash_mha

    q = jnp.zeros((1, 2048, 4, 64), jnp.float32)

    def loss(q):
        return jnp.sum(flash_mha(q, q, q) ** 2)

    jax.jit(jax.grad(loss)).lower(q)  # traces fwd+bwd on both platforms


def test_small_d_gate_defaults(monkeypatch):
    """Round-4 measured dispatch (see _use_small_d docstring): the fused
    small-d kernel is the DEFAULT in training graphs (prefer_flash=True,
    +40% chip-measured) and off in sampling graphs (XLA one-shot wins);
    DMTPU_SMALL_D=1/0 force-overrides both ways for single-env A/Bs.
    Cross-attention and unaligned shapes stay out regardless."""
    from dmtpu.ops.attention import _use_small_d

    monkeypatch.delenv("DMTPU_SMALL_D", raising=False)
    assert not _use_small_d(4096, 4096, 40)                    # sampling: off
    assert _use_small_d(4096, 4096, 40, prefer_flash=True)     # training: ON
    assert _use_small_d(1024, 1024, 80, prefer_flash=True)     # SD1.5 level-1
    monkeypatch.setenv("DMTPU_SMALL_D", "1")
    assert _use_small_d(4096, 4096, 40)              # forced on in sampling
    assert _use_small_d(1024, 1024, 80)              # SD1.5 level-1
    assert not _use_small_d(4096, 77, 40)            # cross-attention
    assert not _use_small_d(1000, 1000, 40)          # unaligned S
    assert not _use_small_d(4096, 4096, 160)         # d > 128
    monkeypatch.setenv("DMTPU_SMALL_D", "0")
    assert not _use_small_d(4096, 4096, 40, prefer_flash=True)  # forced off


def test_small_d_opt_in_lowers_in_sampling_graph(monkeypatch):
    """With the env set, a non-training flash_mha at a shape the XLA
    pad_wasteful heuristic would otherwise claim (b*h >= 128) must still
    trace/lower on both platforms (CPU lowers to the mha fallback via
    platform_dependent; the kernel branch is chip-only)."""
    from dmtpu.ops.attention import _should_use_flash, flash_mha

    # b*h = 16*8 = 128: without the opt-in this shape takes the XLA one-shot
    # path — so the lowering below genuinely exercises the small-d gate
    assert not _should_use_flash(16, 1024, 1024, 8, 40, prefer_flash=False)
    monkeypatch.setenv("DMTPU_SMALL_D", "1")
    q = jnp.zeros((16, 1024, 8, 40), jnp.float32)
    jax.jit(lambda q: flash_mha(q, q, q)).lower(q)
