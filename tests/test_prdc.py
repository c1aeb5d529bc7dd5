"""PRDC (precision/recall/density/coverage, Naeem et al. 2020) — the
fidelity-vs-diversity metric pair the reference lacks (metrics/prdc.py)."""

import numpy as np
import pytest
import jax

from blurred_gan_tpu.metrics import prdc, prdc_from_images


def blobs(rng, n, d, center, scale=1.0):
    return center + scale * rng.standard_normal((n, d)).astype(np.float32)


class TestPRDC:
    def test_identical_sets_are_perfect(self):
        rng = np.random.default_rng(0)
        x = blobs(rng, 200, 16, 0.0)
        out = prdc(x, x, k=5)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0
        assert out["coverage"] == 1.0
        # Every fake sits exactly on a real, so each is inside its own ball
        # (distance 0) plus ~its k neighbours' balls: density ≈ (k+1)/k ≥ 1.
        assert out["density"] >= 1.0

    def test_disjoint_clusters_are_zero(self):
        rng = np.random.default_rng(1)
        real = blobs(rng, 200, 16, 0.0)
        fake = blobs(rng, 200, 16, 1000.0)
        out = prdc(real, fake, k=5)
        assert out["precision"] == 0.0
        assert out["recall"] == 0.0
        assert out["density"] == 0.0
        assert out["coverage"] == 0.0

    def test_mode_collapse_signature(self):
        """Fakes collapsed onto one region of the real distribution: high
        precision (all fakes are realistic), low recall/coverage (the real
        manifold is not covered) — the diagnosis FID alone cannot make."""
        rng = np.random.default_rng(2)
        real = blobs(rng, 400, 8, 0.0, scale=5.0)
        anchor = real[0]
        fake = blobs(rng, 400, 8, anchor, scale=0.05)
        out = prdc(real, fake, k=5)
        assert out["precision"] > 0.9
        assert out["coverage"] < 0.2
        assert out["recall"] < 0.5

    def test_same_distribution_scores_high(self):
        rng = np.random.default_rng(3)
        real = blobs(rng, 500, 8, 0.0)
        fake = blobs(rng, 500, 8, 0.0)
        out = prdc(real, fake, k=5)
        assert out["precision"] > 0.8
        assert out["recall"] > 0.8
        assert out["coverage"] > 0.8
        assert 0.5 < out["density"] < 2.0

    def test_asymmetric_set_sizes(self):
        rng = np.random.default_rng(4)
        out = prdc(blobs(rng, 300, 8, 0.0), blobs(rng, 100, 8, 0.0), k=3)
        assert all(0.0 <= v for v in out.values())
        assert out["precision"] <= 1.0 and out["recall"] <= 1.0

    def test_validation(self):
        rng = np.random.default_rng(5)
        x = blobs(rng, 10, 4, 0.0)
        with pytest.raises(ValueError, match="k="):
            prdc(x, x, k=10)  # k must be < N
        with pytest.raises(ValueError, match="feature matrices"):
            prdc(x, blobs(rng, 10, 8, 0.0))  # D mismatch

    def test_from_images_via_shared_extractor(self):
        rng = np.random.default_rng(6)
        reals = rng.uniform(-1, 1, (64, 16, 16, 1)).astype(np.float32)
        out_same = prdc_from_images(reals, reals.copy(), k=3, batch=32,
                                    feature_dim=256)
        assert out_same["precision"] == 1.0
        assert out_same["recall"] == 1.0
        fakes = np.clip(reals + rng.normal(0, 2.0, reals.shape), -1,
                        1).astype(np.float32)
        out_noise = prdc_from_images(reals, fakes, k=3, batch=32,
                                     feature_dim=256)
        assert out_noise["recall"] <= out_same["recall"]
        assert out_noise["precision"] < 1.0
