"""Cross-framework single-step GRADIENT parity against the reference's own
loss code (VERDICT.md round-1 next #3; SURVEY.md §4.4's strongest check).

Identical critic weights, the same (reals, fakes) batch and the same pinned
GP interpolation coefficients go through

- the reference's ``WGANGP.discriminator_loss`` (+ its ``gradient_penalty``
  and drift term, /root/reference/wgan.py:234-285) under a TF GradientTape,
- our ``wgangp_discriminator_loss`` under ``jax.grad``,

and the resulting critic gradients are compared elementwise. This settles the
drift-term question empirically: the reference's loss is an accidental
(B,)-vector (per-sample drift broadcast, wgan.py:282-284) that TF's tape
implicitly sums, so its gradient is exactly **B ×** ours — and since Adam is
invariant to constant gradient scaling, the training dynamics coincide. The
``reference_grad_scale`` compat flag reproduces the ×B semantics bit-for-bit.

Also covered: the blurred variant, where the GP double-backward runs through
the Gaussian blur inside the composed critic (blurred_gan.py:31-34 semantics).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

B, HW, C = 8, 16, 1
GBS = 8.0  # global batch size fed to BOTH loss implementations
SIGMA = 1.2


@pytest.fixture(scope="module")
def tf_ref(tmp_path_factory):
    """(tf, ref_wgan, ref_blurred) with the reference's missing deps stubbed
    (same stubs as benchmarks/reference_baseline.py)."""
    if not os.path.isdir(REF):
        pytest.skip("no reference checkout")
    tf = pytest.importorskip("tensorflow")
    tf.config.set_visible_devices([], "GPU")
    if BENCH not in sys.path:
        sys.path.insert(0, BENCH)
    import reference_baseline

    reference_baseline._install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_wgan = importlib.import_module("wgan")
    ref_bg = importlib.import_module("blurred_gan")
    return tf, ref_wgan, ref_bg


def _tf_models(tf):
    """Tiny deterministic critic (no dropout/BN) + a dummy generator the
    reference model constructor needs."""
    L = tf.keras.layers
    tf.keras.utils.set_random_seed(7)
    disc = tf.keras.Sequential([
        L.Conv2D(8, 3, 2, "same", input_shape=(HW, HW, C)),
        L.LeakyReLU(0.3),
        L.Conv2D(16, 3, 2, "same"),
        L.LeakyReLU(0.3),
        L.Flatten(),
        L.Dense(1),
    ])
    gen = tf.keras.Sequential([
        L.Dense(HW * HW * C, input_shape=(4,)),
        L.Reshape((HW, HW, C)),
    ])
    return gen, disc


class _JaxCritic:
    """Flax mirror of the TF critic above."""

    def __init__(self):
        import flax.linen as nn

        class Critic(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), (2, 2), "SAME")(x)
                x = nn.leaky_relu(x, 0.3)
                x = nn.Conv(16, (3, 3), (2, 2), "SAME")(x)
                x = nn.leaky_relu(x, 0.3)
                x = x.reshape((x.shape[0], -1))
                return nn.Dense(1)(x)

        self.module = Critic()

    def params_from_tf(self, tf_disc):
        ws = tf_disc.get_weights()  # [k0, b0, k1, b1, kd, bd]
        return {
            "Conv_0": {"kernel": jnp.asarray(ws[0]), "bias": jnp.asarray(ws[1])},
            "Conv_1": {"kernel": jnp.asarray(ws[2]), "bias": jnp.asarray(ws[3])},
            "Dense_0": {"kernel": jnp.asarray(ws[4]), "bias": jnp.asarray(ws[5])},
        }

    def grad_order(self, grads):
        """Flatten our grad tree into the reference's trainable_variables
        order (layer-major, kernel-then-bias)."""
        return [grads["Conv_0"]["kernel"], grads["Conv_0"]["bias"],
                grads["Conv_1"]["kernel"], grads["Conv_1"]["bias"],
                grads["Dense_0"]["kernel"], grads["Dense_0"]["bias"]]


def _batch():
    rng = np.random.RandomState(3)
    reals = (rng.rand(B, HW, HW, C).astype(np.float32) * 2 - 1)
    fakes = (rng.rand(B, HW, HW, C).astype(np.float32) * 2 - 1)
    alpha = rng.rand(B, 1, 1, 1).astype(np.float32)
    return reals, fakes, alpha


def _ref_loss_and_grads(tf, model, reals, fakes, alpha):
    """Run the reference's own discriminator_loss under a tape, with its
    gradient_penalty's internal tf.random.uniform pinned to ``alpha``."""
    orig_uniform = tf.random.uniform
    tf.random.uniform = lambda shape, *a, **k: tf.constant(alpha)
    try:
        with tf.GradientTape() as tape:
            fake_scores = model.discriminator(tf.constant(fakes),
                                              training=True)
            real_scores = model.discriminator(tf.constant(reals),
                                              training=True)
            loss_vec = model.discriminator_loss(
                tf.constant(reals), tf.constant(fakes),
                real_scores, fake_scores)
        grads = tape.gradient(loss_vec,
                              model.discriminator.trainable_variables)
    finally:
        tf.random.uniform = orig_uniform
    return np.asarray(loss_vec), [np.asarray(g) for g in grads]


def _our_loss_and_grads(critic_fn, d_params, reals, fakes, alpha,
                        reference_grad_scale=False):
    from blurred_gan_tpu.losses.wgan import wgangp_discriminator_loss

    def loss_fn(p):
        f = lambda x: critic_fn(p, x)
        fake_scores = f(jnp.asarray(fakes))
        real_scores = f(jnp.asarray(reals))
        loss, _ = wgangp_discriminator_loss(
            f, jnp.asarray(reals), jnp.asarray(fakes), real_scores,
            fake_scores, jax.random.PRNGKey(0), global_batch_size=GBS,
            alpha=jnp.asarray(alpha),
            reference_grad_scale=reference_grad_scale)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(d_params)
    return float(loss), grads


class TestPlainCriticGradParity:
    @pytest.fixture(scope="class")
    def setup(self, tf_ref, tmp_path_factory):
        tf, ref_wgan, _ = tf_ref
        gen, disc = _tf_models(tf)
        log_dir = str(tmp_path_factory.mktemp("ref_gp"))
        hp = ref_wgan.WGANGP.HyperParameters(batch_size=B,
                                             global_batch_size=int(GBS))
        cfg = ref_wgan.TrainingConfig(log_dir=log_dir,
                                      checkpoint_dir=log_dir + "/ckpt")
        model = ref_wgan.WGANGP(gen, disc, hyperparams=hp, config=cfg)
        jc = _JaxCritic()
        d_params = jc.params_from_tf(disc)
        critic_fn = lambda p, x: jc.module.apply({"params": p}, x)
        return tf, model, jc, d_params, critic_fn

    def test_loss_value_matches_reference_mean(self, setup):
        tf, model, jc, d_params, critic_fn = setup
        reals, fakes, alpha = _batch()
        ref_loss_vec, _ = _ref_loss_and_grads(tf, model, reals, fakes, alpha)
        our_loss, _ = _our_loss_and_grads(critic_fn, d_params, reals, fakes,
                                          alpha)
        # Their loss is the accidental (B,)-vector; its mean is what their
        # Mean metric logs — and what our scalar loss equals.
        assert ref_loss_vec.shape == (B,)
        assert np.mean(ref_loss_vec) == pytest.approx(our_loss, rel=1e-4)

    def test_gradients_are_B_times_ours(self, setup):
        tf, model, jc, d_params, critic_fn = setup
        reals, fakes, alpha = _batch()
        _, ref_grads = _ref_loss_and_grads(tf, model, reals, fakes, alpha)
        _, our_grads = _our_loss_and_grads(critic_fn, d_params, reals, fakes,
                                           alpha)
        ours = jc.grad_order(our_grads)
        assert len(ref_grads) == len(ours)
        for rg, og in zip(ref_grads, ours):
            np.testing.assert_allclose(rg, B * np.asarray(og),
                                       rtol=2e-3, atol=2e-5)

    def test_compat_flag_matches_reference_exactly(self, setup):
        tf, model, jc, d_params, critic_fn = setup
        reals, fakes, alpha = _batch()
        _, ref_grads = _ref_loss_and_grads(tf, model, reals, fakes, alpha)
        _, our_grads = _our_loss_and_grads(critic_fn, d_params, reals, fakes,
                                           alpha, reference_grad_scale=True)
        for rg, og in zip(ref_grads, jc.grad_order(our_grads)):
            np.testing.assert_allclose(rg, np.asarray(og),
                                       rtol=2e-3, atol=2e-5)


class TestBlurredCriticGradParity:
    """Same comparison with the blur composed into the critic — the GP
    double-backward then differentiates through the blur on both sides
    (blurred_gan.py:31-34; our GAN(blurred=True).critic)."""

    @pytest.fixture(scope="class")
    def setup(self, tf_ref, tmp_path_factory):
        tf, ref_wgan, ref_bg = tf_ref
        gen, disc = _tf_models(tf)
        log_dir = str(tmp_path_factory.mktemp("ref_bgp"))
        hp = ref_bg.BlurredWGANGP.HyperParameters(
            batch_size=B, global_batch_size=int(GBS),
            initial_blur_std=SIGMA)
        cfg = ref_wgan.TrainingConfig(log_dir=log_dir,
                                      checkpoint_dir=log_dir + "/ckpt")
        model = ref_bg.BlurredWGANGP(gen, disc, hyperparams=hp, config=cfg)
        model.blur.std.assign(SIGMA)  # model.std is a read-only property

        from blurred_gan_tpu.ops.blur import blur_images

        jc = _JaxCritic()
        d_params = jc.params_from_tf(disc)
        critic_fn = lambda p, x: jc.module.apply(
            {"params": p}, blur_images(x, jnp.float32(SIGMA)))
        return tf, model, jc, d_params, critic_fn

    def test_blurred_gradients_are_B_times_ours(self, setup):
        tf, model, jc, d_params, critic_fn = setup
        reals, fakes, alpha = _batch()
        ref_loss_vec, ref_grads = _ref_loss_and_grads(tf, model, reals, fakes,
                                                      alpha)
        our_loss, our_grads = _our_loss_and_grads(critic_fn, d_params, reals,
                                                  fakes, alpha)
        assert np.mean(ref_loss_vec) == pytest.approx(our_loss, rel=1e-3)
        for rg, og in zip(ref_grads, jc.grad_order(our_grads)):
            np.testing.assert_allclose(rg, B * np.asarray(og),
                                       rtol=5e-3, atol=5e-5)
