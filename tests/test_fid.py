"""Tests for the streaming FID metric (reference: /root/reference/metrics.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from blurred_gan_tpu.metrics import fid as F


class TestFrechetDistance:
    def test_identical_gaussians_zero(self):
        rng = np.random.RandomState(0)
        mu = rng.randn(16)
        a = rng.randn(16, 16)
        sigma = a @ a.T + np.eye(16)
        assert F.frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0,
                                                                         abs=1e-6)

    def test_mean_shift_only(self):
        # Equal covariances: FID = ||mu1 - mu2||^2 exactly.
        mu1 = np.zeros(8)
        mu2 = np.full(8, 0.5)
        sigma = np.eye(8) * 2.0
        want = float(np.sum((mu1 - mu2) ** 2))
        assert F.frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(want,
                                                                           rel=1e-9)

    def test_diagonal_covariances_closed_form(self):
        # Diagonal sigmas: Tr(S1+S2-2 sqrt(S1 S2)) = sum (sqrt(s1)-sqrt(s2))^2.
        s1 = np.diag([1.0, 4.0, 9.0])
        s2 = np.diag([4.0, 9.0, 16.0])
        want = sum((np.sqrt(a) - np.sqrt(b)) ** 2
                   for a, b in zip([1, 4, 9], [4, 9, 16]))
        got = F.frechet_distance(np.zeros(3), s1, np.zeros(3), s2)
        assert got == pytest.approx(want, rel=1e-9)

    def test_singular_product_jitter_path(self):
        # Rank-deficient covariances exercise the eps-jitter branch
        # (metrics.py:60-64) without raising.
        sigma = np.zeros((4, 4))
        got = F.frechet_distance(np.zeros(4), sigma, np.ones(4), sigma)
        assert got == pytest.approx(4.0, abs=1e-3)


class TestFeatureStats:
    def test_matches_numpy_moments(self):
        rng = np.random.RandomState(1)
        x = rng.randn(500, 12).astype(np.float32)
        st = F.FeatureStats(12)
        for i in range(0, 500, 100):
            st.update(jnp.asarray(x[i:i + 100]))
        mu, sigma = st.finalize()
        np.testing.assert_allclose(mu, x.mean(axis=0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(sigma, np.cov(x, rowvar=False),
                                   rtol=1e-3, atol=1e-4)


class TestFIDMetric:
    def test_identical_streams_near_zero(self):
        rng = np.random.RandomState(2)
        m = F.FIDMetric(feature_dim=32)
        x = rng.rand(64, 16, 16, 3).astype(np.float32)
        m.update_state(jnp.asarray(x), jnp.asarray(x))
        assert m.result() == pytest.approx(0.0, abs=1e-3)

    def test_monotone_under_noise(self):
        rng = np.random.RandomState(3)
        x = rng.rand(128, 16, 16, 3).astype(np.float32)
        vals = []
        for noise in [0.05, 0.5]:
            m = F.FIDMetric(feature_dim=32)
            y = x + noise * rng.randn(*x.shape).astype(np.float32)
            m.update_state(jnp.asarray(x), jnp.asarray(y))
            vals.append(m.result())
        assert vals[0] < vals[1]

    def test_reset(self):
        rng = np.random.RandomState(4)
        m = F.FIDMetric(feature_dim=16)
        x = rng.rand(32, 16, 16, 1).astype(np.float32)
        m.update_state(jnp.asarray(x), jnp.asarray(x))
        m.reset_states()
        assert float(m._real.n) == 0.0

    def test_custom_feature_fn(self):
        m = F.FIDMetric(feature_fn=lambda b: b.reshape(b.shape[0], -1))
        rng = np.random.RandomState(5)
        x = rng.rand(32, 4, 4, 1).astype(np.float32)
        y = rng.rand(32, 4, 4, 1).astype(np.float32) + 1.0
        m.update_state(jnp.asarray(x), jnp.asarray(y))
        assert m.result() > 10.0  # mean shift of 1 in 16 dims


class TestInceptionPreprocess:
    def test_resize_and_tile(self):
        from blurred_gan_tpu.metrics.fid import inception_preprocess

        x = jnp.ones((2, 28, 28, 1), jnp.float32)
        y = inception_preprocess(x, size=75)
        assert y.shape == (2, 75, 75, 3)
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)


class TestCalculateFid:
    def test_matches_frechet_on_moments(self):
        rng = np.random.RandomState(6)
        x = rng.randn(400, 8).astype(np.float32)
        y = (rng.randn(400, 8) + 0.5).astype(np.float32)
        got = F.calculate_fid(x, y)
        want = F.frechet_distance(x.mean(0), np.cov(x, rowvar=False),
                                  y.mean(0), np.cov(y, rowvar=False))
        # (calculate_fid upcasts to float64 before the moments; the hand
        # computation above takes float32 means — agree to float32 precision)
        assert got == pytest.approx(want, rel=1e-6)
