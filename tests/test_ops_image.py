import jax.numpy as jnp
import numpy as np

from scavislam_tpu.ops.image import (
    bilinear_sample,
    build_pyramid,
    nearest_sample,
    preprocess_frame,
    sobel_xy,
)


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((384, 512), jnp.float32)
        pyr = build_pyramid(img, 3)
        assert pyr[0].shape == (384, 512)
        assert pyr[1].shape == (192, 256)
        assert pyr[2].shape == (96, 128)

    def test_constant_preserved(self):
        img = jnp.full((64, 64), 0.5, jnp.float32)
        pyr = build_pyramid(img, 3)
        for p in pyr:
            np.testing.assert_allclose(p, 0.5, atol=1e-6)


class TestSobel:
    def test_linear_ramp_gradient(self):
        # I(u, v) = 0.01 * u  =>  dx = 0.01, dy = 0
        u = jnp.arange(32, dtype=jnp.float32)[None, :]
        img = jnp.broadcast_to(0.01 * u, (32, 32))
        dx, dy = sobel_xy(img)
        interior = (slice(2, -2), slice(2, -2))
        np.testing.assert_allclose(dx[interior], 0.01, atol=1e-5)
        np.testing.assert_allclose(dy[interior], 0.0, atol=1e-5)


class TestPreprocess:
    def test_uint8_scaling(self):
        img = jnp.full((64, 64), 128, jnp.uint8)
        out = preprocess_frame(img, 3)
        np.testing.assert_allclose(out["pyr"][0], 128.0 / 255.0, atol=1e-6)
        assert len(out["pyr"]) == 3 and len(out["dx"]) == 3


class TestBilinear:
    def test_exact_on_grid(self):
        img = jnp.arange(16.0, dtype=jnp.float32).reshape(4, 4)
        uv = jnp.array([[1.0, 2.0], [3.0, 0.0]])
        vals, ok = bilinear_sample(img, uv)
        np.testing.assert_allclose(vals, [img[2, 1], img[0, 3]])
        assert ok.all()

    def test_midpoint(self):
        img = jnp.array([[0.0, 1.0], [2.0, 3.0]], jnp.float32)
        val, ok = bilinear_sample(img, jnp.array([0.5, 0.5]))
        np.testing.assert_allclose(val, 1.5)

    def test_out_of_bounds(self):
        img = jnp.ones((4, 4), jnp.float32)
        val, ok = bilinear_sample(img, jnp.array([-1.0, 0.0]), fill=-9.0)
        assert not bool(ok)
        np.testing.assert_allclose(val, -9.0)

    def test_nearest(self):
        img = jnp.arange(16.0, dtype=jnp.float32).reshape(4, 4)
        val, ok = nearest_sample(img, jnp.array([1.4, 2.6]))
        np.testing.assert_allclose(val, img[3, 1])


class TestBinomial3:
    def test_interior_matches_explicit_convolution(self):
        from scavislam_tpu.ops.image import binomial3

        rng = np.random.RandomState(3)
        img = rng.rand(32, 40).astype(np.float32)
        out = np.asarray(binomial3(jnp.asarray(img)))
        k = np.array([0.25, 0.5, 0.25], np.float32)
        ref = np.zeros_like(img)
        for dy, wy in zip((-1, 0, 1), k):
            for dx, wx in zip((-1, 0, 1), k):
                ref += wy * wx * np.roll(np.roll(img, dy, 0), dx, 1)
        # the rolled-add formulation wraps at the border (documented: every
        # consumer excludes a wider margin), so the comparison includes it
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_preserves_mean_and_reduces_noise(self):
        from scavislam_tpu.ops.image import binomial3

        rng = np.random.RandomState(0)
        img = 0.5 + 0.1 * rng.randn(64, 64).astype(np.float32)
        out = np.asarray(binomial3(jnp.asarray(img)))
        np.testing.assert_allclose(out.mean(), img.mean(), atol=1e-6)
        # iid-noise variance shrinks by sum(k^2)^2 = 0.375^2 ~ 0.14
        assert out.std() < 0.5 * img.std()
