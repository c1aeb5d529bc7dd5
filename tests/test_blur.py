"""Unit tests for ops/blur: matmul path vs depthwise oracle vs scipy goldens.

Test strategy per SURVEY.md §4.1: blur kernel vs scipy.ndimage golden values and vs a
direct depthwise conv; kernel normalisation; sigma -> kernel-size policy parity with
the reference (/root/reference/gaussian_blur.py:21-31,60-73).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.ndimage

from blurred_gan_tpu.ops import blur as B


def ref_policy(scale, resolution):
    """The reference sizing policy in plain python (gaussian_blur.py:60-73)."""
    k = np.floor(6.0 * scale) + 1.0
    k = np.clip(k, 3.0, float(resolution))
    std = max((k - 1.0) / 6.0, 0.01)
    return std, int(k)


class TestPolicy:
    @pytest.mark.parametrize("scale", [0.01, 0.05, 0.3, 1.0, 2.5, 5.0, 23.5, 100.0])
    @pytest.mark.parametrize("res", [28, 64, 128])
    def test_effective_params_match_reference_policy(self, scale, res):
        sigma, half = B.effective_blur_params(scale, res)
        ref_std, ref_k = ref_policy(scale, res)
        assert float(sigma) == pytest.approx(ref_std, rel=1e-6)
        assert float(half) == ref_k // 2

    def test_max_taps(self):
        assert B.max_taps(28) == 29
        assert B.max_taps(128) == 129

    def test_kernel_normalised(self):
        g = B.gaussian_kernel_1d(2.0, 13)
        assert float(jnp.sum(g)) == pytest.approx(1.0, abs=1e-6)
        m = B.masked_gaussian_taps(2.0, 64)
        assert float(jnp.sum(m)) == pytest.approx(1.0, abs=1e-6)

    def test_masked_taps_equal_dynamic_kernel(self):
        # Fixed-buffer taps == the reference's dynamic-size kernel, zero-extended.
        for scale in [0.3, 1.0, 2.5, 7.7]:
            res = 64
            ref_std, ref_k = ref_policy(scale, res)
            dyn = np.asarray(B.gaussian_kernel_1d(ref_std, ref_k))
            fix = np.asarray(B.masked_gaussian_taps(scale, res))
            k = B.max_taps(res)
            pad = (k - dyn.shape[0]) // 2
            expected = np.zeros(k, np.float32)
            expected[pad:pad + dyn.shape[0]] = dyn
            np.testing.assert_allclose(fix, expected, atol=1e-6)


class TestBlurNumerics:
    @pytest.mark.parametrize("scale", [0.05, 0.8, 2.0, 6.0])
    def test_matmul_matches_depthwise(self, scale):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 28, 28, 3).astype(np.float32))
        ref_std, ref_k = ref_policy(scale, 28)
        want = B.gaussian_blur_depthwise(x, ref_std, ref_k)
        got = B.blur_images(x, jnp.float32(scale))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_scipy_interior(self):
        # Away from borders (where padding modes differ) the blur must match
        # scipy.ndimage.gaussian_filter.
        rng = np.random.RandomState(1)
        x = rng.randn(1, 64, 64, 1).astype(np.float32)
        scale = 2.0
        ref_std, ref_k = ref_policy(scale, 64)
        got = np.asarray(B.blur_images(jnp.asarray(x), scale))[0, :, :, 0]
        want = scipy.ndimage.gaussian_filter(
            x[0, :, :, 0], sigma=ref_std, truncate=(ref_k // 2) / ref_std,
            mode="constant")
        m = ref_k  # generous interior margin
        np.testing.assert_allclose(got[m:-m, m:-m], want[m:-m, m:-m],
                                   rtol=2e-3, atol=2e-4)

    def test_tiny_sigma_floors_at_3tap_kernel(self):
        # The policy clips kernel size to >= 3 and re-derives sigma = (3-1)/6
        # (gaussian_blur.py:67-72), so any scale below ~1/3 yields the *same* blur.
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 28, 28, 1).astype(np.float32))
        y_tiny = np.asarray(B.blur_images(x, 0.01))
        y_03 = np.asarray(B.blur_images(x, 0.3))
        np.testing.assert_allclose(y_tiny, y_03, atol=1e-6)
        # and it is *almost* identity: centre tap of a sigma=1/3 3-tap kernel ~ 0.978.
        assert np.abs(y_tiny - np.asarray(x)).max() < 0.5

    def test_preserves_mean_interior(self):
        # A constant image stays constant away from the zero-padded border.
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        y = np.asarray(B.blur_images(x, 3.0))
        interior = y[0, 20:-20, 20:-20, :]
        np.testing.assert_allclose(interior, 1.0, atol=1e-4)

    def test_no_recompilation_across_sigmas(self):
        # sigma is a traced argument: one compilation serves the whole schedule.
        calls = []

        @jax.jit
        def f(x, s):
            calls.append(1)  # traced once per compilation
            return B.blur_images(x, s)

        x = jnp.zeros((1, 28, 28, 1))
        for s in [0.05, 1.0, 5.0, 13.9]:
            f(x, jnp.float32(s)).block_until_ready()
        assert len(calls) == 1

    def test_grad_flows_through_blur(self):
        # The GP path differentiates through the blur (SURVEY.md §2 bug-note on
        # wgan.py:237); make sure the matmul formulation is differentiable in both
        # the image and sigma.
        x = jnp.ones((1, 16, 16, 1), jnp.float32)

        def loss(img, s):
            return jnp.sum(B.blur_images(img, s) ** 2)

        gx = jax.grad(loss, argnums=0)(x, 2.0)
        gs = jax.grad(loss, argnums=1)(x, 2.0)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(float(gs))

    def test_nonsquare_images(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
        ref_std, ref_k = ref_policy(1.5, 32)  # policy uses max(h, w)
        want = B.gaussian_blur_depthwise(x, ref_std, ref_k)
        got = B.blur_images(x, 1.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
