

class TestMaskGuidanceDDIMCFG:
    """Latent-inpainting CFG composition (MaskGuidance x DDIMCFG MRO)."""

    def _model(self):
        # per-SAMPLE embed dependence: in the 2B batched CFG call the cond
        # and uncond halves must produce DIFFERENT outputs, otherwise the
        # guided combine degenerates and a broken CFG path would still pass
        return lambda x, t, text_embed=None, **kw: (
            0.1 * x + 0.05 * text_embed.mean(axis=(1, 2))[:, None, None, None])

    def _sample(self, d, key=0):
        import jax
        import jax.numpy as jnp

        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
        return d.sample(
            self._model(),
            jax.random.normal(jax.random.PRNGKey(key), (2, 8, 8, 4)),
            jax.random.PRNGKey(key + 1),
            uncond_conditioning=jnp.zeros_like(ctx),
            model_kwargs=dict(text_embed=ctx))

    def test_all_known_mask_reproduces_image_exactly(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dmtpu.diffusions.guidance import MaskGuidanceDDIMCFG

        d = MaskGuidanceDDIMCFG(guidance_scale=3.0, cond_kwarg="text_embed",
                                total_steps=100, respace_type="uniform",
                                respace_steps=8)
        img = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4))
        d.set_mask_and_image(img, jnp.ones((2, 8, 8, 1)))
        out = self._sample(d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   rtol=1e-5, atol=1e-6)

    def test_all_unknown_mask_equals_plain_ddimcfg(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dmtpu.diffusions import DDIMCFG
        from dmtpu.diffusions.guidance import MaskGuidanceDDIMCFG

        kw = dict(guidance_scale=3.0, cond_kwarg="text_embed",
                  total_steps=100, respace_type="uniform", respace_steps=8)
        d = MaskGuidanceDDIMCFG(**kw)
        d.set_mask_and_image(jnp.zeros((2, 8, 8, 4)), jnp.zeros((2, 8, 8, 1)))
        plain = DDIMCFG(**kw)
        np.testing.assert_allclose(np.asarray(self._sample(d)),
                                   np.asarray(self._sample(plain)),
                                   rtol=1e-6, atol=1e-6)

    def test_partial_mask_keeps_known_regenerates_rest(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dmtpu.diffusions.guidance import MaskGuidanceDDIMCFG

        d = MaskGuidanceDDIMCFG(guidance_scale=3.0, cond_kwarg="text_embed",
                                total_steps=100, respace_type="uniform",
                                respace_steps=8)
        img = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 4))
        mask = jnp.ones((2, 8, 8, 1)).at[:, 2:6, 2:6].set(0.0)
        d.set_mask_and_image(img, mask)
        out = self._sample(d)
        known_err = float(jnp.abs((out - img) * mask).max())
        assert known_err < 1e-5
        assert not np.allclose(np.asarray(out * (1 - mask)),
                               np.asarray(img * (1 - mask)), atol=1e-2)
