"""Tests for the model zoo, the standalone blur layer, losses (incl. plain
WGAN), and the config/CLI system.
"""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.losses.wgan import (
    gradient_penalty,
    wgan_discriminator_loss,
    wgan_generator_loss,
)
from blurred_gan_tpu.models import (
    DCGANDiscriminator,
    DCGANGenerator,
    GaussianBlur,
    celeba_discriminator,
    celeba_generator,
    mnist_discriminator,
    mnist_generator,
)
from blurred_gan_tpu.ops.blur import blur_images
from blurred_gan_tpu.train import (
    GAN,
    WGANHyperParameters,
    BlurredWGANGPHyperParameters,
    TrainingConfig,
    create_train_state,
    make_train_step,
)


class TestModelZoo:
    def test_mnist_shapes(self):
        g, d = mnist_generator(), mnist_discriminator()
        z = jnp.zeros((2, 100))
        gv = g.init(jax.random.PRNGKey(0), z, train=False)
        x = g.apply(gv, z, train=False)
        assert x.shape == (2, 28, 28, 1)
        dv = d.init(jax.random.PRNGKey(1), x, train=False)
        s = d.apply(dv, x, train=False)
        assert s.shape == (2, 1)

    @pytest.mark.parametrize("res", [8, 16, 64])
    def test_celeba_shapes(self, res):
        g, d = celeba_generator(res), celeba_discriminator(res)
        z = jnp.zeros((1, 100))
        gv = g.init(jax.random.PRNGKey(0), z, train=False)
        x = g.apply(gv, z, train=False)
        assert x.shape == (1, res, res, 3)
        dv = d.init(jax.random.PRNGKey(1), x, train=False)
        assert d.apply(dv, x, train=False).shape == (1, 1)

    def test_celeba128_matches_reference_depth(self):
        # demo_celeba.py:51-124: G has 7 conv stages (1+5 up + final),
        # D has 6 stride-2 convs 16..512.
        g = celeba_generator(128)
        assert len(g.blocks) == 6 and g.blocks[0] == (512, 1)
        d = celeba_discriminator(128)
        assert tuple(d.channels) == (16, 32, 64, 128, 256, 512)

    def test_output_range_tanh(self):
        g = mnist_generator()
        z = jax.random.uniform(jax.random.PRNGKey(2), (4, 100))
        gv = g.init(jax.random.PRNGKey(0), z, train=False)
        x = g.apply(gv, z, train=False)
        assert float(jnp.max(jnp.abs(x))) <= 1.0

    @pytest.mark.parametrize("factory,res,shape", [
        (lambda: mnist_generator(upsample="resize"), None, (2, 28, 28, 1)),
        (lambda: celeba_generator(64, upsample="resize"), 64, (2, 64, 64, 3)),
    ])
    def test_resize_upsample_shapes(self, factory, res, shape):
        # The resize-convolution variant (Odena et al.) must hit the exact
        # output geometry of the transpose variant at every resolution.
        g = factory()
        z = jnp.zeros((2, 100))
        gv = g.init(jax.random.PRNGKey(0), z, train=False)
        x = g.apply(gv, z, train=False)
        assert x.shape == shape

    def test_resize_upsample_trains(self):
        # One full blurred WGAN-GP step on the resize generator: finite loss,
        # params move (grad-of-grad through the new path included).
        g = celeba_generator(16, upsample="resize")
        d = celeba_discriminator(16)
        gan = GAN(g, d, blurred=True)
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=4)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 3))
        before = np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])
        step = make_train_step(gan, hp, donate_state=False)
        reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3),
                                   minval=-1.0, maxval=1.0)
        state2, metrics, _ = step(state, reals, jnp.float32(1.5),
                                  jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["disc_loss"]))
        assert np.isfinite(float(metrics["gen_loss"]))
        after = np.asarray(jax.tree_util.tree_leaves(state2.g_params)[0])
        assert after.shape == before.shape and not np.array_equal(after,
                                                                  before)

    def test_resize_upsample_rejects_unknown(self):
        g = DCGANGenerator(upsample="nearest??")
        with pytest.raises(ValueError):
            g.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)), train=False)


class TestGaussianBlurLayer:
    def test_explicit_sigma_matches_op(self):
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32))
        layer = GaussianBlur(initial_std=0.05, impl="einsum")
        vars_ = layer.init(jax.random.PRNGKey(0), x)
        y = layer.apply(vars_, x, sigma=2.0)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(blur_images(x, 2.0, impl="einsum")),
            rtol=1e-5, atol=1e-6)

    def test_variable_sigma_override(self):
        x = jnp.ones((1, 16, 16, 1))
        layer = GaussianBlur(initial_std=0.05, impl="einsum")
        vars_ = layer.init(jax.random.PRNGKey(0), x)
        assert float(vars_["blur"]["blur_std"]) == pytest.approx(0.05)
        y = layer.apply({"blur": {"blur_std": jnp.float32(3.0)}}, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(blur_images(x, 3.0, impl="einsum")),
            rtol=1e-5, atol=1e-6)


class TestLosses:
    def test_wgan_losses_scaling(self):
        real = jnp.asarray([[1.0], [2.0]])
        fake = jnp.asarray([[0.5], [0.5]])
        # sum(fake - real)/global_bs with global_bs=4 (2 of 4 samples local).
        assert float(wgan_discriminator_loss(real, fake, 4.0)) == \
            pytest.approx((0.5 - 1 + 0.5 - 2) / 4)
        assert float(wgan_generator_loss(fake, 4.0)) == pytest.approx(-1 / 4)

    def test_gp_on_linear_critic_is_exact(self):
        # For D(x) = <w, x>, ||grad D|| = ||w|| everywhere, so
        # GP = (||w|| - 1)^2 exactly (SURVEY.md §4.1).
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(16).astype(np.float32))
        critic = lambda x: x.reshape(x.shape[0], -1) @ w
        reals = jnp.asarray(rng.randn(8, 2, 2, 4).astype(np.float32))
        fakes = jnp.asarray(rng.randn(8, 2, 2, 4).astype(np.float32))
        gp = gradient_penalty(critic, reals, fakes, jax.random.PRNGKey(1))
        want = (float(jnp.linalg.norm(w)) - 1.0) ** 2
        assert float(gp) == pytest.approx(want, rel=1e-4)

    def test_plain_wgan_step_no_gp(self):
        # WGANHyperParameters has no gp_coefficient -> pure WGAN path
        # (wgan.py:28-231 without the GP subclass).
        hp = WGANHyperParameters(batch_size=4, global_batch_size=4)
        g = DCGANGenerator(latent_size=8, init_hw=(4, 4), init_features=16,
                           blocks=((16, 2),), out_channels=1,
                           final_transpose=False, final_stride=1)
        d = DCGANDiscriminator(channels=(8,))
        gan = GAN(g, d, latent_size=8, blurred=True)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (8, 8, 1))
        step = make_train_step(gan, hp, donate_state=False)
        x = jnp.zeros((4, 8, 8, 1))
        state, m, _ = step(state, x, jnp.float32(0.5), jax.random.PRNGKey(1))
        assert float(m["gp_term"]) == 0.0
        assert np.isfinite(float(m["disc_loss"]))


class TestConfigCLI:
    def test_inherited_flags(self):
        parser = argparse.ArgumentParser()
        BlurredWGANGPHyperParameters.add_arguments(parser)
        TrainingConfig.add_arguments(parser)
        args = parser.parse_args([
            "--learning_rate", "0.0002", "--gp_coefficient", "5",
            "--initial_blur_std", "7.5", "--log_dir", "/tmp/x"])
        hp = BlurredWGANGPHyperParameters.from_args(args)
        cfg = TrainingConfig.from_args(args)
        assert hp.learning_rate == 2e-4
        assert hp.gp_coefficient == 5.0
        assert hp.initial_blur_std == 7.5
        assert hp.d_steps_per_g_step == 1  # default preserved
        assert cfg.log_dir == "/tmp/x"

    def test_json_roundtrip(self, tmp_path):
        hp = BlurredWGANGPHyperParameters(learning_rate=3e-4)
        p = tmp_path / "hp.json"
        hp.save_json(str(p))
        hp2 = BlurredWGANGPHyperParameters.from_json(str(p))
        assert hp2 == hp


class TestProfiling:
    def test_step_timer(self):
        from blurred_gan_tpu.utils.profiling import StepTimer

        t = StepTimer()
        t.tick(32)
        t.tick(32)
        r = t.rate()
        assert r is not None and r > 0
        assert t.rate() is None  # nothing since last reading


class TestDStepsPerGStep:
    def test_gen_update_every_other_batch(self):
        # d_steps_per_g_step=2: gen fires on batches 0, 2, 4 (checked before
        # the counter increments, wgan.py:105-106).
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=4,
                                          d_steps_per_g_step=2)
        g = DCGANGenerator(latent_size=8, init_hw=(4, 4), init_features=16,
                           blocks=((16, 2),), out_channels=1,
                           final_transpose=False, final_stride=1)
        d = DCGANDiscriminator(channels=(8,))
        gan = GAN(g, d, latent_size=8, blurred=True)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (8, 8, 1))
        step = make_train_step(gan, hp, donate_state=False)
        x = jnp.zeros((4, 8, 8, 1))
        fired = []
        for i in range(4):
            state, m, _ = step(state, x, jnp.float32(0.5),
                               jax.random.PRNGKey(i))
            fired.append(bool(m["did_gen_step"]))
        assert fired == [True, False, True, False]


class TestScaleUpStructure:
    def test_celeba256_structure(self):
        # 256 is the resolution-headroom target (SURVEY.md §5.7): 7 G stages
        # from 4x4, D downsamples 256 -> 4 with the full channel ladder.
        g = celeba_generator(256)
        assert len(g.blocks) == 7
        strides = [s for _, s in g.blocks]
        assert strides == [1, 2, 2, 2, 2, 2, 2]
        d = celeba_discriminator(256)
        assert tuple(d.channels) == (16, 32, 64, 128, 256, 512)

    def test_celeba512_structure_and_forward(self):
        # 512 is the next headroom stop past 256: 8 G stages reach 4*2^7,
        # D's six stride-2 stages land at 8x8 before the Dense head. The
        # Pallas blur still fits VMEM at 512^2 (test_fixes_r2), so the whole
        # blurred critic path stays on the fused kernel.
        g = celeba_generator(512)
        assert [s for _, s in g.blocks] == [1] + [2] * 7
        d = celeba_discriminator(512)
        assert tuple(d.channels) == (16, 32, 64, 128, 256, 512)
        z = jnp.zeros((1, 100))
        gv = g.init(jax.random.PRNGKey(0), z, train=False)
        x = g.apply(gv, z, train=False)
        assert x.shape == (1, 512, 512, 3)
        dv = d.init(jax.random.PRNGKey(1), x, train=False)
        assert d.apply(dv, x, train=False).shape == (1, 1)

    def test_remat_critic_step_runs(self):
        # remat_critic=True rematerializes D in the GP double-backward
        # (memory headroom for 256+); the step must stay numerically sane.
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=4)
        g = DCGANGenerator(latent_size=8, init_hw=(4, 4), init_features=16,
                           blocks=((16, 2),), out_channels=1,
                           final_transpose=False, final_stride=1)
        d = DCGANDiscriminator(channels=(8,))
        gan_plain = GAN(g, d, latent_size=8, blurred=True)
        gan_remat = GAN(g, d, latent_size=8, blurred=True, remat_critic=True)
        state = create_train_state(gan_plain, hp, jax.random.PRNGKey(0),
                                   (8, 8, 1))
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1),
                               jnp.float32, -1, 1)
        k = jax.random.PRNGKey(2)
        s1, m1, _ = make_train_step(gan_plain, hp, donate_state=False)(
            state, x, jnp.float32(0.5), k)
        s2, m2, _ = make_train_step(gan_remat, hp, donate_state=False)(
            state, x, jnp.float32(0.5), k)
        # remat must not change the math
        assert float(m1["disc_loss"]) == pytest.approx(
            float(m2["disc_loss"]), rel=1e-5)


class TestSaveOnInterrupt:
    def test_sigint_triggers_save_once(self):
        import os
        import signal

        from blurred_gan_tpu.train.checkpoint import save_on_interrupt

        calls = []
        with pytest.raises(KeyboardInterrupt):
            with save_on_interrupt(lambda: calls.append(1)):
                os.kill(os.getpid(), signal.SIGINT)
        assert calls == [1]
        # handlers restored: a second SIGINT outside the context raises the
        # default KeyboardInterrupt without calling save again.
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
        assert calls == [1]

    def test_trace_writes_files(self, tmp_path):
        import os

        import jax.numpy as jnp

        from blurred_gan_tpu.utils import profiling

        with profiling.trace(str(tmp_path)):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        found = []
        for root, _, files in os.walk(tmp_path):
            found.extend(files)
        assert found, "no trace artifacts written"
