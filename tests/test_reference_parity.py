"""Cross-framework parity tests against the reference implementation itself.

These import the reference's own modules read-only from /root/reference (TF
Gaussian blur; the NVIDIA numpy/scipy SWD stack) and compare our TPU-native
implementations on identical inputs — the strongest form of the SURVEY.md §4.4
parity harness that runs without datasets.

Skipped automatically when TF or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def _import_ref_module(name):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module(name)


@pytest.fixture(scope="module")
def ref_blur():
    if not HAS_REF:
        pytest.skip("no reference checkout")
    tf = pytest.importorskip("tensorflow")
    tf.config.set_visible_devices([], "GPU")
    return _import_ref_module("gaussian_blur"), tf


@pytest.fixture(scope="module")
def ref_sw():
    if not HAS_REF:
        pytest.skip("no reference checkout")
    return _import_ref_module("sliced_wasserstein")


class TestBlurParity:
    """Our blur vs the reference's tf.nn.depthwise_conv2d blur
    (gaussian_blur.py:50-132), same σ policy, same inputs."""

    @pytest.mark.parametrize("scale", [0.05, 0.5, 1.0, 2.5, 4.9])
    def test_blur_images_matches_reference(self, ref_blur, scale):
        gb, tf = ref_blur
        from blurred_gan_tpu.ops.blur import blur_images

        rng = np.random.RandomState(42)
        x = rng.rand(2, 28, 28, 3).astype(np.float32)
        want = gb.blur_images(tf.convert_to_tensor(x),
                              tf.constant(scale, tf.float32)).numpy()
        got = np.asarray(blur_images(jnp.asarray(x), jnp.float32(scale),
                                     impl="einsum"))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_blur_parity_at_celeba_scale(self, ref_blur):
        gb, tf = ref_blur
        from blurred_gan_tpu.ops.blur import blur_images

        rng = np.random.RandomState(7)
        x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
        for scale in [1.0, 8.0]:
            want = gb.blur_images(tf.convert_to_tensor(x),
                                  tf.constant(scale, tf.float32)).numpy()
            got = np.asarray(blur_images(jnp.asarray(x), jnp.float32(scale),
                                         impl="einsum"))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-5)

    def test_sizing_helpers_match(self, ref_blur):
        gb, tf = ref_blur
        from blurred_gan_tpu.ops import blur as B

        for std in [0.3, 1.0, 5.0, 23.5]:
            assert float(B.appropriate_kernel_size(std)) == pytest.approx(
                float(gb.appropriate_kernel_size(tf.constant(std)).numpy()))
        for k in [3.0, 7.0, 29.0]:
            assert float(B.appropriate_std(k)) == pytest.approx(
                float(gb.appropriate_std(tf.constant(k)).numpy()))


class TestSWDParity:
    """Our device SWD stack vs the reference's NVIDIA numpy implementation
    (sliced_wasserstein.py) on identical inputs."""

    def test_pyramid_matches_reference_exactly(self, ref_sw):
        from blurred_gan_tpu.metrics import swd as S

        rng = np.random.RandomState(0)
        x_nchw = rng.randn(3, 3, 32, 32).astype(np.float32)
        ref_pyr = ref_sw.generate_laplacian_pyramid(x_nchw.copy(), 2)
        our_pyr = S.laplacian_pyramid(
            jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))), 2)
        for r, o in zip(ref_pyr, our_pyr):
            np.testing.assert_allclose(
                np.transpose(np.asarray(o), (0, 3, 1, 2)), r,
                rtol=1e-4, atol=1e-4)

    def test_pyr_down_up_match(self, ref_sw):
        from blurred_gan_tpu.metrics import swd as S

        rng = np.random.RandomState(1)
        x_nchw = rng.randn(2, 3, 16, 16).astype(np.float32)
        x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.transpose(np.asarray(S.pyr_down(x_nhwc)), (0, 3, 1, 2)),
            ref_sw.pyr_down(x_nchw), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.transpose(np.asarray(S.pyr_up(x_nhwc)), (0, 3, 1, 2)),
            ref_sw.pyr_up(x_nchw), rtol=1e-5, atol=1e-5)

    def test_swd_value_statistically_matches(self, ref_sw):
        # Same descriptor sets through both projection+sort pipelines. The
        # random directions differ (np RNG vs jax RNG), so compare values, not
        # bits: with 4x128 directions on structured data the estimator's
        # spread is a few percent.
        from blurred_gan_tpu.metrics.swd import (finalize_descriptors,
                                                 sliced_wasserstein_distance)

        rng = np.random.RandomState(2)
        a = rng.randn(2048, 147).astype(np.float32)
        b = (rng.randn(2048, 147) * 1.4 + 0.3).astype(np.float32)
        ours = float(sliced_wasserstein_distance(
            jnp.asarray(a), jnp.asarray(b), jax.random.PRNGKey(0)))
        theirs = ref_sw.sliced_wasserstein(a, b, 4, 128)
        assert ours == pytest.approx(theirs, rel=0.05)

    def test_finalize_descriptors_matches(self, ref_sw):
        from blurred_gan_tpu.metrics.swd import finalize_descriptors

        rng = np.random.RandomState(3)
        # reference layout: (N, C, k, k) then flattened
        d4 = rng.randn(512, 3, 7, 7).astype(np.float32) * 2 + 1
        want = ref_sw.finalize_descriptors(d4.copy())
        got = np.asarray(finalize_descriptors(
            jnp.asarray(d4.reshape(512, -1)), channels=3))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
