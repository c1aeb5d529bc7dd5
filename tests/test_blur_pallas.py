"""Tests for the fused blur primitive (ops/blur_pallas.py).

On the CPU test platform the primitive lowers to its einsum rule; the Pallas
kernel body itself is additionally exercised in TPU interpret mode. The AD rules
(JVP product rule, transpose) are platform-independent and are what the WGAN-GP
grad-of-grad relies on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from blurred_gan_tpu.ops.blur import blur_images
from blurred_gan_tpu.ops.blur_pallas import blur_images_pallas, blur_planes


@pytest.fixture
def x():
    return jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))


class TestForward:
    def test_matches_einsum_path(self, x):
        got = blur_images_pallas(x, jnp.float32(2.0))
        want = blur_images(x, jnp.float32(2.0), impl="einsum")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_kernel_body_interpret_mode(self, x):
        with pltpu.force_tpu_interpret_mode():
            got = blur_images_pallas(x, jnp.float32(1.3))
        want = blur_images(x, jnp.float32(1.3), impl="einsum")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_nonsquare(self):
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 16, 32, 1).astype(np.float32))
        got = blur_images_pallas(x, jnp.float32(1.5))
        want = blur_images(x, jnp.float32(1.5), impl="einsum")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_jit_no_recompile_across_sigma(self, x):
        traced = []

        @jax.jit
        def f(im, s):
            traced.append(1)
            return blur_images_pallas(im, s)

        for s in [0.1, 1.0, 4.0]:
            f(x, jnp.float32(s)).block_until_ready()
        assert len(traced) == 1


class TestAutodiff:
    def test_first_order_grad_matches(self, x):
        def loss(im, impl):
            return jnp.sum(blur_images(im, 2.0, impl=impl) ** 2)

        g_p = jax.grad(lambda im: loss(im, "pallas"))(x)
        g_e = jax.grad(lambda im: loss(im, "einsum"))(x)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_e),
                                   rtol=1e-4, atol=1e-5)

    def test_grad_of_grad_matches(self, x):
        # The WGAN-GP pattern: differentiate the gradient-norm penalty.
        def gp(im, impl):
            g = jax.grad(
                lambda y: jnp.sum(blur_images(y, 2.0, impl=impl) ** 2))(im)
            n = im.shape[0]
            return jnp.sum(jnp.sqrt(jnp.sum(g.reshape(n, -1) ** 2, axis=1)))

        gg_p = jax.grad(lambda im: gp(im, "pallas"))(x)
        gg_e = jax.grad(lambda im: gp(im, "einsum"))(x)
        np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_e),
                                   rtol=1e-4, atol=1e-5)

    def test_jvp(self, x):
        dx = jnp.ones_like(x)
        f_p = lambda im: blur_images_pallas(im, jnp.float32(1.7))
        f_e = lambda im: blur_images(im, jnp.float32(1.7), impl="einsum")
        _, t_p = jax.jvp(f_p, (x,), (dx,))
        _, t_e = jax.jvp(f_e, (x,), (dx,))
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_e),
                                   rtol=1e-5, atol=1e-6)

    def test_sigma_grad_consistent(self, x):
        # The sizing policy floors/steps sigma_eff (floor(6σ)/6), so dσ is zero
        # a.e. — both paths must agree (and be finite).
        gs_p = jax.grad(lambda s: jnp.sum(blur_images_pallas(x, s)))(
            jnp.float32(2.0))
        gs_e = jax.grad(
            lambda s: jnp.sum(blur_images(x, s, impl="einsum")))(
            jnp.float32(2.0))
        assert np.isfinite(float(gs_p))
        assert float(gs_p) == pytest.approx(float(gs_e), abs=1e-5)


class TestBatchingRule:
    def test_vmap_over_planes(self):
        rng = np.random.RandomState(2)
        xs = jnp.asarray(rng.randn(3, 4, 16, 16).astype(np.float32))
        t = jnp.eye(16) * 0.5
        got = jax.vmap(lambda p: blur_planes(p, t, t))(xs)
        want = jnp.stack([blur_planes(xs[i], t, t) for i in range(3)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
