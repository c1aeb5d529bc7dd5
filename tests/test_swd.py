"""Tests for the on-device SWD stack vs host-numpy golden implementations.

Golden oracles are written here in plain numpy/scipy following the protocol of
/root/reference/sliced_wasserstein.py (5×5 binomial pyramid, mirror padding), so the
device implementation is checked against an independent formulation.
"""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

from blurred_gan_tpu.metrics import swd as S

BINOMIAL = np.float32([
    [1, 4, 6, 4, 1],
    [4, 16, 24, 16, 4],
    [6, 24, 36, 24, 6],
    [4, 16, 24, 16, 4],
    [1, 4, 6, 4, 1]]) / 256.0


def np_pyr_down(x_nchw):
    return scipy.ndimage.convolve(
        x_nchw, BINOMIAL[None, None], mode="mirror")[:, :, ::2, ::2]


def np_pyr_up(x_nchw):
    s = x_nchw.shape
    res = np.zeros((s[0], s[1], s[2] * 2, s[3] * 2), x_nchw.dtype)
    res[:, :, ::2, ::2] = x_nchw
    return scipy.ndimage.convolve(res, BINOMIAL[None, None] * 4.0, mode="mirror")


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


class TestPyramid:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.x = rng.randn(2, 3, 32, 32).astype(np.float32)

    def test_pyr_down_matches_scipy(self):
        got = nchw(S.pyr_down(jnp.asarray(nhwc(self.x))))
        want = np_pyr_down(self.x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pyr_up_matches_scipy(self):
        got = nchw(S.pyr_up(jnp.asarray(nhwc(self.x))))
        want = np_pyr_up(self.x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pyramid_roundtrip(self):
        # reconstruct(laplacian_pyramid(x)) == x (sliced_wasserstein.py:90-94).
        pyr = S.laplacian_pyramid(jnp.asarray(nhwc(self.x)), 2)
        rec = S.reconstruct_laplacian_pyramid(pyr)
        np.testing.assert_allclose(np.asarray(rec), nhwc(self.x),
                                   rtol=1e-4, atol=1e-4)

    def test_resolutions(self):
        assert S.swd_resolutions(128) == [128, 64, 32, 16]
        assert S.swd_resolutions(28) == [28]
        assert S.swd_resolutions(16) == [16]
        # Below the protocol floor: single native-resolution level, not [].
        assert S.swd_resolutions(8) == [8]

    def test_metric_below_protocol_floor(self):
        # res-8 runs crashed with a zero-level extractor (IndexError on an
        # empty key split); the fallback gives one native level.
        m = S.SWDMetric()
        rng = np.random.RandomState(3)
        r = rng.rand(8, 8, 8, 3).astype(np.float32) * 2 - 1
        f = rng.rand(8, 8, 8, 3).astype(np.float32) * 2 - 1
        m.update_state(r, f)
        out = m.results()
        assert set(out) == {"SWDx1e3_8", "SWDx1e3_avg"}
        assert np.isfinite(out["SWDx1e3_8"])


class TestDescriptors:
    def test_shapes_and_bounds(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
        d = S.patch_descriptors(x, jax.random.PRNGKey(0), 7, 16)
        assert d.shape == (4 * 16, 3 * 49)
        assert np.isfinite(np.asarray(d)).all()

    def test_patches_come_from_their_image(self):
        # Image i is constant value i -> every descriptor from image i is all-i.
        x = jnp.stack([jnp.full((16, 16, 3), float(i)) for i in range(4)])
        d = np.asarray(S.patch_descriptors(x, jax.random.PRNGKey(1), 7, 8))
        for i in range(4):
            np.testing.assert_allclose(d[i * 8:(i + 1) * 8], float(i))

    def test_component_order_is_channel_major(self):
        # Channel c holds constant value c -> descriptor = [0]*49+[1]*49+[2]*49.
        x = jnp.broadcast_to(jnp.arange(3, dtype=jnp.float32), (1, 16, 16, 3))
        d = np.asarray(S.patch_descriptors(x, jax.random.PRNGKey(2), 7, 4))
        expected = np.repeat(np.arange(3, dtype=np.float32), 49)
        np.testing.assert_allclose(d, np.tile(expected, (4, 1)))

    def test_finalize_normalises_per_channel(self):
        rng = np.random.RandomState(2)
        d = jnp.asarray(rng.randn(256, 3 * 49).astype(np.float32) * 5 + 3)
        f = np.asarray(S.finalize_descriptors(d, 3)).reshape(256, 3, 49)
        np.testing.assert_allclose(f.mean(axis=(0, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(f.std(axis=(0, 2)), 1.0, atol=1e-3)


class TestSWD:
    def test_identical_sets_give_zero(self):
        rng = np.random.RandomState(3)
        a = jnp.asarray(rng.randn(512, 147).astype(np.float32))
        d = S.sliced_wasserstein_distance(a, a, jax.random.PRNGKey(0))
        assert float(d) == pytest.approx(0.0, abs=1e-6)

    def test_shifted_distribution_distance(self):
        # Sorted-projection SWD of N(0,I) vs N(m,I) ≈ E|<m, u>| for unit dirs u:
        # for |m|=delta in D dims, E|proj shift| = delta * E|u_1| ~ delta*sqrt(2/(pi*D)).
        rng = np.random.RandomState(4)
        dim = 64
        a = jnp.asarray(rng.randn(4096, dim).astype(np.float32))
        b = jnp.asarray(rng.randn(4096, dim).astype(np.float32) + 0.0)
        base = float(S.sliced_wasserstein_distance(a, b, jax.random.PRNGKey(1)))
        c = jnp.asarray(rng.randn(4096, dim).astype(np.float32))
        c = c.at[:, 0].add(2.0)
        shifted = float(S.sliced_wasserstein_distance(a, c, jax.random.PRNGKey(1)))
        assert shifted > base * 3
        expected = 2.0 * np.sqrt(2.0 / (np.pi * dim))
        assert shifted == pytest.approx(expected, rel=0.25)

    def test_monotone_under_noise(self):
        rng = np.random.RandomState(5)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        key = jax.random.PRNGKey(2)
        vals = []
        for noise in [0.0, 0.1, 0.5]:
            m = S.SWDMetric(nhoods_per_image=64, seed=7)
            noisy = imgs + noise * rng.randn(*imgs.shape).astype(np.float32)
            m.update_state(jnp.asarray(imgs), jnp.asarray(noisy))
            vals.append(m.result())
        assert vals[0] < vals[1] < vals[2]

    def test_metric_names_and_streaming(self):
        rng = np.random.RandomState(6)
        m = S.SWDMetric(nhoods_per_image=32)
        for _ in range(3):
            r = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
            f = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
            m.update_state(r, f)
        res = m.results()
        assert set(res) == {"SWDx1e3_32", "SWDx1e3_16", "SWDx1e3_avg"}
        assert res["SWDx1e3_avg"] == pytest.approx(
            (res["SWDx1e3_32"] + res["SWDx1e3_16"]) / 2, rel=1e-6)
        m.reset_states()
        assert all(len(d) == 0 for d in m.real_descriptors)

    def test_fakes_not_built_from_reals(self):
        # The bug fixed from metrics.py:131: with very different reals/fakes the
        # distance must be clearly nonzero.
        rng = np.random.RandomState(7)
        m = S.SWDMetric(nhoods_per_image=64)
        reals = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
        fakes = jnp.zeros((8, 32, 32, 3), jnp.float32)
        m.update_state(reals, fakes)
        assert m.result() > 1.0


class TestSWDAPI:
    def test_protocol(self):
        from blurred_gan_tpu.metrics.swd import SWDAPI

        rng = np.random.RandomState(9)
        api = SWDAPI((1, 32, 32, 3))
        assert api.get_metric_names() == ["SWDx1e3_32", "SWDx1e3_16",
                                          "SWDx1e3_avg"]
        reals = rng.rand(8, 32, 32, 3).astype(np.float32)
        api.begin("reals")
        api.feed("reals", reals[:4])
        api.feed("reals", reals[4:])
        self_dist = api.end("reals")  # reals vs reals
        assert len(self_dist) == 3
        api.begin("fakes")
        api.feed("fakes", np.zeros((8, 32, 32, 3), np.float32))
        fake_dist = api.end("fakes")
        assert fake_dist[-1] > self_dist[-1]


class TestDownscale:
    def test_average_pool(self):
        from blurred_gan_tpu.metrics.swd import downscale_minibatch

        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        y = downscale_minibatch(x, 1)
        assert y.shape == (1, 2, 2, 1)
        np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0],
                                   (0 + 1 + 4 + 5) / 4)
        np.testing.assert_array_equal(np.asarray(downscale_minibatch(x, 0)),
                                      np.asarray(x))
