"""KID (Kernel Inception Distance, Bińkowski et al. 2018) — the unbiased
small-sample companion to FID the reference lacks (metrics/kid.py)."""

import numpy as np
import pytest

from blurred_gan_tpu.metrics import kid, kid_from_images


def _kid_oracle(x, y, n_subsets, m, seed):
    """Independent pure-numpy implementation of the paper's estimator."""
    rng = np.random.RandomState(seed)
    d = x.shape[1]
    vals = []
    for _ in range(n_subsets):
        xs = x[rng.choice(len(x), m, replace=False)].astype(np.float64)
        ys = y[rng.choice(len(y), m, replace=False)].astype(np.float64)
        kxx = (xs @ xs.T / d + 1.0) ** 3
        kyy = (ys @ ys.T / d + 1.0) ** 3
        kxy = (xs @ ys.T / d + 1.0) ** 3
        np.fill_diagonal(kxx, 0.0)
        np.fill_diagonal(kyy, 0.0)
        vals.append(kxx.sum() / (m * (m - 1)) + kyy.sum() / (m * (m - 1))
                    - 2.0 * kxy.mean())
    return float(np.mean(vals)), float(np.std(vals))


class TestKID:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((120, 16)).astype(np.float32)
        y = (rng.standard_normal((150, 16)) + 0.5).astype(np.float32)
        out = kid(x, y, n_subsets=8, subset_size=64, seed=3)
        mean, std = _kid_oracle(x, y, 8, 64, 3)
        assert out["kid"] == pytest.approx(mean, rel=1e-4, abs=1e-6)
        assert out["kid_std"] == pytest.approx(std, rel=1e-3, abs=1e-6)

    def test_identical_distribution_is_near_zero(self):
        """Unbiased estimator: E[KID] = 0 for same-distribution sets (can
        legitimately dip slightly negative, unlike FID's O(1/n) bias)."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((400, 32)).astype(np.float32)
        y = rng.standard_normal((400, 32)).astype(np.float32)
        out = kid(x, y, n_subsets=20, subset_size=200)
        assert abs(out["kid"]) < 0.005
        # A clearly shifted distribution scores orders of magnitude higher.
        z = (rng.standard_normal((400, 32)) + 1.0).astype(np.float32)
        assert kid(x, z, n_subsets=20, subset_size=200)["kid"] > 10 * abs(
            out["kid"])

    def test_monotone_in_shift(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((300, 8)).astype(np.float32)
        scores = [kid(x, x + s, n_subsets=10, subset_size=128)["kid"]
                  for s in (0.0, 0.5, 1.0, 2.0)]
        assert scores == sorted(scores)

    def test_subset_size_clamped_and_deterministic(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((50, 4)).astype(np.float32)
        y = rng.standard_normal((40, 4)).astype(np.float32)
        a = kid(x, y, n_subsets=5, subset_size=1000)  # clamps to 40
        b = kid(x, y, n_subsets=5, subset_size=1000)
        assert a == b  # fixed seed → bit-identical across calls

    def test_full_set_clamp_is_single_exact_estimate(self):
        """When subset_size covers BOTH sets, every without-replacement
        subset is the full set (the U-statistic is permutation-invariant),
        so kid() computes one exact value instead of n_subsets copies —
        mean equal to any multi-subset run of the same clamp, std 0."""
        rng = np.random.default_rng(7)
        x = rng.standard_normal((30, 4)).astype(np.float32)
        y = rng.standard_normal((30, 4)).astype(np.float32)
        out = kid(x, y, n_subsets=100, subset_size=64)
        assert out["kid_std"] == 0.0
        # The exact value equals the estimator applied to the full sets.
        direct = kid(x, y, n_subsets=1, subset_size=30)
        assert out["kid"] == pytest.approx(direct["kid"], abs=1e-9)

    def test_input_validation(self):
        x = np.zeros((10, 4), np.float32)
        with pytest.raises(ValueError):
            kid(x, np.zeros((10, 5), np.float32))
        with pytest.raises(ValueError):
            kid(x, np.zeros((1, 4), np.float32))
        with pytest.raises(ValueError):
            kid(np.zeros((10, 4, 2), np.float32), x)
        with pytest.raises(ValueError):  # m(m-1) denominator needs m >= 2
            kid(x, x, subset_size=1)

    def test_from_images_pipeline(self):
        """Image-level wiring through the shared random-conv extractor:
        same images ≈ 0, different images > same."""
        rng = np.random.default_rng(4)
        reals = rng.uniform(-1, 1, (60, 16, 16, 3)).astype(np.float32)
        fakes = np.clip(reals + 0.5, -1, 1)
        same = kid_from_images(reals, reals.copy(), n_subsets=4,
                               subset_size=32, batch=20, feature_dim=64)
        diff = kid_from_images(reals, fakes, n_subsets=4, subset_size=32,
                               batch=20, feature_dim=64)
        assert abs(same["kid"]) < 1e-3
        assert diff["kid"] > same["kid"]
