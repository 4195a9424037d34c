"""Token Merging (ToMe) — matching oracle, merge/unmerge algebra, UNet gate.

The op under test is dmtpu/ops/tome.py (static-shape bipartite soft
matching); integration is the SD SpatialTransformer / SDUNetModel plumbing
(tome_ratio etc., serving-only, no params added).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.ops.tome import (
    bipartite_soft_matching_2d,
    dst_index_grid,
    identity_merge,
    tome_r,
)


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestPartition:
    def test_grid_covers_all_tokens_once(self):
        for (h, w, sx, sy) in [(8, 8, 2, 2), (6, 10, 2, 2), (9, 7, 3, 2)]:
            a, b = dst_index_grid(h, w, sx, sy)
            both = np.concatenate([a, b])
            assert len(both) == h * w
            assert len(np.unique(both)) == h * w
            assert len(b) == (h // sy) * (w // sx)

    def test_seeded_offsets_stay_in_cells(self):
        h, w, sx, sy = 8, 8, 2, 2
        _, b = dst_index_grid(h, w, sx, sy, seed=3)
        ys, xs = b // w, b % w
        # exactly one dst per (sy, sx) cell
        cells = set(zip(ys // sy, xs // sx))
        assert len(cells) == (h // sy) * (w // sx) == len(b)

    def test_tome_r_clamps_to_source_count(self):
        n, h, w = 64, 8, 8
        assert tome_r(n, 0.5, h, w) == 32
        assert tome_r(n, 0.9, h, w) == 48  # src set = 64 - 16
        assert tome_r(n, 0.0, h, w) == 0

    def test_degenerate_grid_is_identity(self):
        # cell bigger than the token grid -> no dst tokens -> identity,
        # not a zero-size argmax at trace time (review finding)
        h = w = 4
        assert tome_r(h * w, 0.5, h, w, sx=16, sy=16) == 0
        x = _rand(30, 1, h * w, 4)
        m, u = bipartite_soft_matching_2d(x, h, w, sx=16, sy=16,
                                          r=int(h * w * 0.5))
        assert (m(x) is x) and (u(x) is x)


class TestMatchingOracle:
    """Brute-force numpy re-derivation of the matching on random input."""

    def test_merge_matches_numpy_oracle(self):
        h = w = 8
        B, C, r = 2, 16, 20
        x = np.asarray(_rand(0, B, h * w, C))
        merge, _ = bipartite_soft_matching_2d(jnp.asarray(x), h, w, r=r)
        got = np.asarray(merge(jnp.asarray(x)))

        a_idx, b_idx = dst_index_grid(h, w, 2, 2)
        mn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
        for bi in range(B):
            scores = mn[bi, a_idx] @ mn[bi, b_idx].T
            node_max, node_idx = scores.max(1), scores.argmax(1)
            order = np.argsort(-node_max, kind="stable")
            src, unm = order[:r], np.sort(order[r:])
            dst = x[bi, b_idx].astype(np.float64)
            cnt = np.ones(len(b_idx))
            for s in src:
                dst[node_idx[s]] += x[bi, a_idx[s]]
                cnt[node_idx[s]] += 1
            dst /= cnt[:, None]
            want = np.concatenate([x[bi, a_idx[unm]], dst], axis=0)
            np.testing.assert_allclose(got[bi], want, rtol=1e-5, atol=1e-5)


class TestMergeUnmergeAlgebra:
    def test_shapes(self):
        h = w = 8
        x = _rand(1, 3, h * w, 8)
        m, u = bipartite_soft_matching_2d(x, h, w, r=24)
        y = m(x)
        assert y.shape == (3, h * w - 24, 8)
        assert u(y).shape == x.shape

    def test_r_zero_is_identity(self):
        m, u = bipartite_soft_matching_2d(_rand(2, 1, 64, 4), 8, 8, r=0)
        x = _rand(3, 1, 64, 4)
        assert (m(x) is x) and (u(x) is x)

    def test_duplicate_cells_roundtrip_exact(self):
        # every 2x2 cell holds 4 identical (cell-distinct) tokens: merging is
        # lossless (mean of identical) and unmerge reconstructs x exactly
        h = w = 8
        cells = _rand(4, 1, (h // 2) * (w // 2), 6)
        grid = cells.reshape(1, h // 2, w // 2, 6)
        x = jnp.repeat(jnp.repeat(grid, 2, axis=1), 2, axis=2).reshape(1, h * w, 6)
        r = tome_r(h * w, 0.75, h, w)  # merge every source token
        assert r == 48
        m, u = bipartite_soft_matching_2d(x, h, w, r=r)
        np.testing.assert_allclose(np.asarray(u(m(x))), np.asarray(x),
                                   rtol=1e-6, atol=1e-6)

    def test_merge_of_unmerge_is_identity(self):
        # m and u come from one matching: u fans dst values back out, m
        # re-averages identical group members -> m(u(y)) == y
        h = w = 8
        metric = _rand(5, 2, h * w, 8)
        m, u = bipartite_soft_matching_2d(metric, h, w, r=30)
        y = m(_rand(6, 2, h * w, 8))
        np.testing.assert_allclose(np.asarray(m(u(y))), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)

    def test_per_batch_independent_matching(self):
        # batch item 1 permuted differently -> its own argmax; merging a
        # batch of [x; x] must equal stacking two singleton merges
        h = w = 8
        x0, x1 = _rand(7, 1, 64, 8), _rand(8, 1, 64, 8)
        xb = jnp.concatenate([x0, x1], axis=0)
        mb, _ = bipartite_soft_matching_2d(xb, h, w, r=16)
        m0, _ = bipartite_soft_matching_2d(x0, h, w, r=16)
        m1, _ = bipartite_soft_matching_2d(x1, h, w, r=16)
        np.testing.assert_allclose(
            np.asarray(mb(xb)),
            np.asarray(jnp.concatenate([m0(x0), m1(x1)], axis=0)),
            rtol=1e-5, atol=1e-5)

    def test_jit_compatible(self):
        h = w = 8

        @jax.jit
        def f(x):
            m, u = bipartite_soft_matching_2d(x, h, w, r=16)
            return u(m(x) * 2.0)

        out = f(_rand(9, 2, 64, 4))
        assert out.shape == (2, 64, 4) and bool(jnp.isfinite(out).all())


def _randomize(p, seed=0):
    """Replace params with nonzero values (proj_out convs are zero-init, so
    fresh-init outputs would hide any ToMe effect behind the residual)."""
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype), p)


class TestSpatialTransformerToMe:
    C = 32  # GroupNorm(32) needs channels % 32 == 0

    def _st(self, **kw):
        from dmtpu.models.stablediffusion.attention import SpatialTransformer

        return SpatialTransformer(n_heads=4, d_head=8, depth=1, **kw)

    def test_ratio_zero_matches_baseline_exactly(self):
        x = _rand(10, 2, 8, 8, self.C)
        ctx = _rand(11, 2, 7, self.C)
        base = self._st()
        p = _randomize(base.init(jax.random.PRNGKey(0), x, ctx))
        tome = self._st(tome_ratio=0.0)
        np.testing.assert_array_equal(
            np.asarray(base.apply(p, x, ctx)), np.asarray(tome.apply(p, x, ctx)))

    def test_tome_shares_params_and_changes_output(self):
        x = _rand(12, 2, 8, 8, self.C)
        ctx = _rand(13, 2, 7, self.C)
        base = self._st()
        tome = self._st(tome_ratio=0.5)
        p = base.init(jax.random.PRNGKey(0), x, ctx)
        pt = tome.init(jax.random.PRNGKey(0), x, ctx)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), p, pt))
        p = _randomize(p)
        out_b, out_t = base.apply(p, x, ctx), tome.apply(p, x, ctx)
        assert out_t.shape == out_b.shape
        assert not np.allclose(np.asarray(out_b), np.asarray(out_t))
        assert bool(jnp.isfinite(out_t).all())

    def test_duplicate_cells_close_to_baseline(self):
        # identical tokens per 2x2 cell: merging loses no information; the
        # only drift is key multiplicity in the softmax -> outputs stay close
        cells = _rand(14, 1, 16, self.C)
        grid = cells.reshape(1, 4, 4, self.C)
        x = jnp.repeat(jnp.repeat(grid, 2, axis=1), 2, axis=2)
        ctx = _rand(15, 1, 7, self.C)
        base, tome = self._st(), self._st(tome_ratio=0.5)
        p = _randomize(base.init(jax.random.PRNGKey(1), x, ctx))
        np.testing.assert_allclose(
            np.asarray(base.apply(p, x, ctx)), np.asarray(tome.apply(p, x, ctx)),
            rtol=0.15, atol=0.15)

    def test_cross_attn_only_block_skips_tome(self):
        # disable_self_attn -> attn1 is cross-attention; ToMe must not touch it
        x = _rand(16, 1, 8, 8, self.C)
        ctx = _rand(17, 1, 7, self.C)
        base = self._st(disable_self_attn=True)
        tome = self._st(disable_self_attn=True, tome_ratio=0.5)
        p = _randomize(base.init(jax.random.PRNGKey(2), x, ctx))
        np.testing.assert_array_equal(
            np.asarray(base.apply(p, x, ctx)), np.asarray(tome.apply(p, x, ctx)))


class TestUNetToMe:
    def _unet(self, **kw):
        from dmtpu.models.stablediffusion.unet import SDUNetModel

        return SDUNetModel(
            in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
            use_spatial_transformer=True, transformer_depth=1, context_dim=16,
            legacy=False, **kw)

    def _inputs(self):
        x = _rand(20, 2, 16, 16, 4)
        t = jnp.array([3, 7], jnp.int32)
        ctx = _rand(21, 2, 7, 16)
        return x, t, ctx

    def test_params_identical_and_output_differs(self):
        x, t, ctx = self._inputs()
        base, tome = self._unet(), self._unet(tome_ratio=0.5)
        p = base.init(jax.random.PRNGKey(0), x, t, ctx)
        pt = tome.init(jax.random.PRNGKey(0), x, t, ctx)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), p, pt))
        p = _randomize(p)
        ob, ot = base.apply(p, x, t, ctx), tome.apply(p, x, t, ctx)
        assert ot.shape == ob.shape and bool(jnp.isfinite(ot).all())
        assert not np.allclose(np.asarray(ob), np.asarray(ot))

    def test_max_downsample_gates_levels(self):
        # ds=1-only merging vs ds<=2 merging must differ (level-1 attention
        # merges too); both differ from baseline
        x, t, ctx = self._inputs()
        base = self._unet()
        t1 = self._unet(tome_ratio=0.5, tome_max_downsample=1)
        t2 = self._unet(tome_ratio=0.5, tome_max_downsample=2)
        p = _randomize(base.init(jax.random.PRNGKey(0), x, t, ctx))
        o1, o2 = t1.apply(p, x, t, ctx), t2.apply(p, x, t, ctx)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_wrapper_set_tome_rebinds(self):
        from dmtpu.models.stablediffusion import StableDiffusion

        sd = StableDiffusion(unet_config={
            "target": "dmtpu.models.stablediffusion.SDUNetModel",
            "params": dict(in_channels=4, model_channels=32, out_channels=4,
                           num_res_blocks=1, attention_resolutions=(1,),
                           channel_mult=(1, 2), num_heads=4,
                           use_spatial_transformer=True, transformer_depth=1,
                           context_dim=16, legacy=False)})
        assert sd.unet.tome_ratio == 0.0
        sd.set_tome(0.4, seed=7)
        assert sd.unet.tome_ratio == 0.4 and sd.unet.tome_seed == 7
        # unspecified knobs KEEP their value across calls (review finding)
        sd.set_tome(0.6)
        assert sd.unet.tome_ratio == 0.6 and sd.unet.tome_seed == 7
        sd.set_tome(0.6, max_downsample=2)
        assert sd.unet.tome_max_downsample == 2 and sd.unet.tome_seed == 7
        sd.set_tome(0.0)
        assert sd.unet.tome_ratio == 0.0
        assert sd.unet.tome_max_downsample == 2

    def test_training_grads_flow_through_tome(self):
        # ToMe is differentiable (gathers + one-hot matmuls; indices are
        # constants), so it applies to TRAINING too — the SpatialTransformers
        # are 76% of the SD train step (docs/ROADMAP.md decomposition).
        # Check grads are finite, nonzero into attn1 q/k/v, and differ from
        # the unmerged model's grads; also under full remat.
        x, t, ctx = self._inputs()
        for remat in (False, True):
            base = self._unet(use_checkpoint=remat)
            tome = self._unet(tome_ratio=0.5, use_checkpoint=remat)
            p = _randomize(base.init(jax.random.PRNGKey(0), x, t, ctx))

            def loss(params, model):
                return jnp.mean(model.apply(params, x, t, ctx) ** 2)

            gb = jax.grad(loss)(p, base)
            gt = jax.grad(loss)(p, tome)
            finite = jax.tree.map(lambda a: bool(jnp.isfinite(a).all()), gt)
            assert jax.tree.all(finite)
            qkv = gt["params"]["input_blocks__1__1"]["transformer_blocks__0"][
                "attn1"]["to_q"]["kernel"]
            assert float(jnp.abs(qkv).max()) > 0
            flat_b = jnp.concatenate([g.ravel() for g in jax.tree.leaves(gb)])
            flat_t = jnp.concatenate([g.ravel() for g in jax.tree.leaves(gt)])
            assert not np.allclose(np.asarray(flat_b), np.asarray(flat_t))

    def test_dp_sharded_matches_unsharded(self):
        # per-batch-item matching is batch-local, so a DP-sharded apply must
        # be bit-compatible with the single-device result (multi-chip
        # serving viability; the sampling CLIs DP-shard exactly like this)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cpus = jax.devices("cpu")
        if len(cpus) < 8:
            import pytest

            pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
        x = _rand(40, 8, 16, 16, 4)
        t = jnp.arange(8, dtype=jnp.int32)
        ctx = _rand(41, 8, 7, 16)
        tome = self._unet(tome_ratio=0.5)
        p = _randomize(tome.init(jax.random.PRNGKey(0), x, t, ctx))
        want = tome.apply(p, x, t, ctx)
        mesh = Mesh(np.array(cpus[:8]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        xs = jax.device_put(x, shard)
        ts = jax.device_put(t, shard)
        cs = jax.device_put(ctx, shard)
        got = jax.jit(lambda p, a, b, c: tome.apply(p, a, b, c))(p, xs, ts, cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_sdxl_style_config_merges_at_level1(self):
        # SDXL has no attention at ds=1 (attention_resolutions=(4, 2)):
        # tome_max_downsample=2 targets the ds=2 level through the same
        # superset UNet
        from dmtpu.models.stablediffusion.unet import SDUNetModel

        kw = dict(in_channels=4, model_channels=32, out_channels=4,
                  num_res_blocks=1, attention_resolutions=(4, 2),
                  channel_mult=(1, 2, 4), num_head_channels=8,
                  use_spatial_transformer=True, transformer_depth=(1, 1, 2),
                  context_dim=16, use_linear_in_transformer=True, legacy=False)
        base = SDUNetModel(**kw)
        tome = SDUNetModel(tome_ratio=0.5, tome_max_downsample=2, **kw)
        x = _rand(50, 1, 16, 16, 4)
        t = jnp.zeros((1,), jnp.int32)
        ctx = _rand(51, 1, 7, 16)
        p = _randomize(base.init(jax.random.PRNGKey(0), x, t, ctx))
        ob, ot = base.apply(p, x, t, ctx), tome.apply(p, x, t, ctx)
        assert bool(jnp.isfinite(ot).all())
        assert not np.allclose(np.asarray(ob), np.asarray(ot))

    def test_deepcache_composes_with_tome(self):
        # shallow DeepCache pass with ToMe on: runs, finite, cached shape kept
        x, t, ctx = self._inputs()
        tome = self._unet(tome_ratio=0.5)
        p = tome.init(jax.random.PRNGKey(0), x, t, ctx)
        out_full, u = tome.apply(p, x, t, ctx, dc_skip=1)
        out_shallow, _ = tome.apply(p, x, t, ctx, dc_skip=1, dc_cached=u)
        assert bool(jnp.isfinite(out_shallow).all())
        assert out_shallow.shape == out_full.shape
