"""FreeU (dmtpu/ops/freeu.py) — filter semantics, UNet gate, wrapper rebind."""
import jax
import jax.numpy as jnp
import numpy as np

from dmtpu.ops.freeu import SD15_DEFAULTS, apply_freeu, fourier_filter


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestFourierFilter:
    def test_scale_one_is_identity(self):
        x = _rand(0, 2, 8, 8, 4)
        np.testing.assert_allclose(np.asarray(fourier_filter(x, 1, 1.0)),
                                   np.asarray(x), rtol=1e-5, atol=1e-5)

    def test_constant_image_scaled_by_s(self):
        # a constant image has all energy at DC, which the threshold=1 box
        # covers -> output == s * x
        x = jnp.full((1, 8, 8, 3), 2.5, jnp.float32)
        out = fourier_filter(x, 1, 0.2)
        np.testing.assert_allclose(np.asarray(out), 0.5 * np.ones_like(out),
                                   rtol=1e-5, atol=1e-5)

    def test_high_frequency_untouched(self):
        # the Nyquist checkerboard lives far from the center box
        yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        checker = ((-1.0) ** (yy + xx)).astype(np.float32)
        x = jnp.asarray(checker)[None, :, :, None]
        out = fourier_filter(x, 1, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_numpy_oracle(self):
        x = np.asarray(_rand(1, 2, 8, 6, 3))
        got = np.asarray(fourier_filter(jnp.asarray(x), 1, 0.3))
        xf = np.fft.fftshift(np.fft.fftn(x, axes=(1, 2)), axes=(1, 2))
        mask = np.ones((1, 8, 6, 1))
        mask[:, 3:5, 2:4, :] = 0.3
        want = np.fft.ifftn(np.fft.ifftshift(xf * mask, axes=(1, 2)),
                            axes=(1, 2)).real
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bf16_roundtrip_dtype(self):
        x = _rand(2, 1, 8, 8, 4).astype(jnp.bfloat16)
        assert fourier_filter(x, 1, 0.5).dtype == jnp.bfloat16


class TestApplyFreeu:
    def test_stage_gating(self):
        mc = 8
        b1, b2, s1, s2 = 1.5, 1.6, 0.9, 0.2
        # stage 1: backbone c == 4*mc
        h = _rand(3, 1, 4, 4, 4 * mc)
        sk = _rand(4, 1, 4, 4, 2 * mc)
        h2, sk2 = apply_freeu(h, sk, mc, b1, b2, s1, s2)
        np.testing.assert_allclose(np.asarray(h2[..., :2 * mc]),
                                   np.asarray(h[..., :2 * mc]) * b1, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(h2[..., 2 * mc:]),
                                      np.asarray(h[..., 2 * mc:]))
        assert not np.allclose(np.asarray(sk2), np.asarray(sk))
        # stage 2: c == 2*mc
        h = _rand(5, 1, 4, 4, 2 * mc)
        h2, _ = apply_freeu(h, sk, mc, b1, b2, s1, s2)
        np.testing.assert_allclose(np.asarray(h2[..., :mc]),
                                   np.asarray(h[..., :mc]) * b2, rtol=1e-6)
        # other channel counts: pass-through
        h = _rand(6, 1, 4, 4, mc)
        h2, sk2 = apply_freeu(h, sk, mc, b1, b2, s1, s2)
        assert h2 is h and sk2 is sk


class TestUNetFreeU:
    def _unet(self, **kw):
        from dmtpu.models.stablediffusion.unet import SDUNetModel

        return SDUNetModel(
            in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2, 4), num_heads=4,
            use_spatial_transformer=True, transformer_depth=1, context_dim=16,
            legacy=False, **kw)

    def _inputs(self):
        return (_rand(20, 2, 16, 16, 4), jnp.array([3, 7], jnp.int32),
                _rand(21, 2, 7, 16))

    def test_params_identical_output_differs_finite(self):
        x, t, ctx = self._inputs()
        base = self._unet()
        fu = self._unet(freeu=SD15_DEFAULTS)
        p = base.init(jax.random.PRNGKey(0), x, t, ctx)
        pf = fu.init(jax.random.PRNGKey(0), x, t, ctx)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), p, pf))
        # zero-init output/proj convs would mask the FreeU effect
        rng = np.random.RandomState(0)
        p = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype), p)
        ob, of = base.apply(p, x, t, ctx), fu.apply(p, x, t, ctx)
        assert of.shape == ob.shape and bool(jnp.isfinite(of).all())
        assert not np.allclose(np.asarray(ob), np.asarray(of))

    def test_neutral_scales_match_baseline(self):
        # b=1, s=1 FreeU is an exact no-op (fft roundtrip within tolerance)
        x, t, ctx = self._inputs()
        base = self._unet()
        fu = self._unet(freeu=(1.0, 1.0, 1.0, 1.0))
        p = base.init(jax.random.PRNGKey(0), x, t, ctx)
        np.testing.assert_allclose(np.asarray(fu.apply(p, x, t, ctx)),
                                   np.asarray(base.apply(p, x, t, ctx)),
                                   rtol=1e-4, atol=1e-5)

    def test_composes_with_tome_in_jitted_sampler(self):
        from dmtpu.diffusions import DDIM

        x, t, ctx = self._inputs()
        m = self._unet(freeu=SD15_DEFAULTS, tome_ratio=0.5)
        p = m.init(jax.random.PRNGKey(0), x, t, ctx)
        sam = DDIM(total_steps=1000, respace_type="uniform", respace_steps=5)
        out = jax.jit(lambda p, n, k: sam.sample(
            lambda xx, tt, **kw: m.apply(p, xx, tt, ctx), n, k))(
            p, _rand(22, 2, 16, 16, 4), jax.random.PRNGKey(1))
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())

    def test_wrapper_set_freeu(self):
        from dmtpu.models.stablediffusion import StableDiffusion

        sd = StableDiffusion(unet_config={
            "target": "dmtpu.models.stablediffusion.SDUNetModel",
            "params": dict(in_channels=4, model_channels=32, out_channels=4,
                           num_res_blocks=1, attention_resolutions=(1,),
                           channel_mult=(1, 2), num_heads=4,
                           use_spatial_transformer=True, transformer_depth=1,
                           context_dim=16, legacy=False)})
        assert sd.unet.freeu is None
        sd.set_freeu(SD15_DEFAULTS)
        assert sd.unet.freeu == SD15_DEFAULTS
        sd.set_freeu(None)
        assert sd.unet.freeu is None
        # wrong arity must fail fast here, not deep inside a jit trace
        import pytest

        with pytest.raises(ValueError, match="exactly"):
            sd.set_freeu((1.5, 0.9))
