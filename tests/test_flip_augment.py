"""Mirror augmentation (hparams.flip_augment): per-sample 50% horizontal
flips applied on device inside the jitted step. Beyond-parity (the reference
has no augmentation); the standard CelebA/face practice."""

import numpy as np
import jax
import jax.numpy as jnp

from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    create_train_state,
    make_train_step,
)
from blurred_gan_tpu.train.step import random_hflip

from test_train_loop import micro_gan, micro_hparams


class TestRandomHflip:
    def test_flips_are_exact_mirrors(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 8, 8, 3))
        y = np.asarray(random_hflip(x, rng))
        x = np.asarray(x)
        flipped = x[:, :, ::-1, :]
        for i in range(64):
            same = np.array_equal(y[i], x[i])
            mirror = np.array_equal(y[i], flipped[i])
            assert same or mirror, i

    def test_roughly_half_flip(self):
        # Asymmetric images so flipped != original for every sample.
        x = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, None, :, None],
                     (256, 8, 1, 1))
        y = np.asarray(random_hflip(x, jax.random.PRNGKey(3)))
        n_flipped = sum(
            not np.array_equal(y[i], np.asarray(x)[i]) for i in range(256))
        assert 80 < n_flipped < 176  # ~Binomial(256, .5), +/- 6 sigma

    def test_deterministic_per_key(self):
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 1))
        a = np.asarray(random_hflip(x, jax.random.PRNGKey(7)))
        b = np.asarray(random_hflip(x, jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)


class TestFlipInStep:
    def test_step_trains_with_flip(self):
        gan = micro_gan()
        hp = micro_hparams(flip_augment=True)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
        step = make_train_step(gan, hp, donate_state=False)
        rng = jax.random.PRNGKey(5)
        reals = jax.random.uniform(jax.random.fold_in(rng, 9),
                                   (8, 16, 16, 1), jnp.float32, -1, 1)
        state, m, _ = step(state, reals, jnp.float32(0.7), rng)
        assert np.isfinite(float(m["disc_loss"]))
        assert int(state.n_batches) == 1

    def test_flip_wired_into_the_traced_program(self, monkeypatch):
        """flip_augment=True routes the reals through random_hflip at trace
        time; flip_augment=False never calls it. (A flip-on/off output
        comparison cannot prove this — enabling the flag also offsets the
        step's RNG stream, which changes the output regardless.)"""
        import blurred_gan_tpu.train.step as step_mod

        calls = []
        orig = step_mod.random_hflip
        monkeypatch.setattr(step_mod, "random_hflip",
                            lambda x, rng: calls.append(1) or orig(x, rng))
        gan = micro_gan()
        reals = jnp.zeros((8, 16, 16, 1), jnp.float32)

        def run(**kw):
            hp = micro_hparams(**kw)
            state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                       (16, 16, 1))
            step = step_mod.make_train_step(gan, hp, donate_state=False)
            step(state, reals, jnp.float32(0.7), jax.random.PRNGKey(5))

        run()
        assert not calls
        run(flip_augment=True)
        assert calls

    def test_composes_with_accumulation(self):
        gan = micro_gan()
        hp = micro_hparams(flip_augment=True, grad_accumulation_steps=2)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
        step = make_train_step(gan, hp, donate_state=False)
        rng = jax.random.PRNGKey(6)
        reals = jax.random.uniform(jax.random.fold_in(rng, 9),
                                   (8, 16, 16, 1), jnp.float32, -1, 1)
        state, m, _ = step(state, reals, jnp.float32(0.7), rng)
        assert np.isfinite(float(m["disc_loss"]))

    def test_config_roundtrip(self, tmp_path):
        hp = BlurredWGANGPHyperParameters(flip_augment=True)
        p = tmp_path / "hp.json"
        hp.save_json(str(p))
        assert BlurredWGANGPHyperParameters.from_json(str(p)).flip_augment
