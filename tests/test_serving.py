"""Serving export (blurred_gan_tpu/serving.py): StableHLO artifact with baked
weights, symbolic batch dimension, EMA variant, and framework-free reload."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.serving import export_generator, load_generator
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    create_train_state,
    make_train_step,
)


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


@pytest.fixture(scope="module")
def trained_state():
    hp = BlurredWGANGPHyperParameters(batch_size=8, global_batch_size=8,
                                      ema_decay=0.9)
    gan = micro_gan()
    state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
    step = make_train_step(gan, hp, donate_state=False)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                               jnp.float32, -1.0, 1.0)
    state, _, _ = step(state, reals, jnp.float32(0.5), jax.random.PRNGKey(2))
    return gan, state


class TestServingExport:
    def test_artifact_matches_live_generator(self, trained_state):
        gan, state = trained_state
        blob = export_generator(gan, state)
        assert isinstance(blob, bytes) and len(blob) > 1000
        serve = load_generator(blob)
        z = gan.sample_latents(jax.random.PRNGKey(7), 4)
        got = np.asarray(serve(z))
        want, _ = gan.generate(state.g_params, state.g_stats, z, train=False)
        np.testing.assert_allclose(got, np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_symbolic_batch_any_size(self, trained_state):
        gan, state = trained_state
        serve = load_generator(export_generator(gan, state))
        for bsz in (1, 3, 9):
            out = serve(np.random.RandomState(bsz).rand(
                bsz, gan.latent_size).astype(np.float32))
            assert out.shape == (bsz, 16, 16, 1)

    def test_ema_variant_differs_and_matches_ema_weights(self, trained_state):
        gan, state = trained_state
        z = gan.sample_latents(jax.random.PRNGKey(9), 4)
        live = np.asarray(load_generator(export_generator(gan, state))(z))
        ema = np.asarray(load_generator(
            export_generator(gan, state, use_ema=True))(z))
        assert not np.allclose(live, ema)
        want, _ = gan.generate(state.g_ema, state.g_stats, z, train=False)
        np.testing.assert_allclose(ema, np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_use_ema_without_ema_state_raises(self, trained_state):
        gan, state = trained_state
        with pytest.raises(ValueError, match="no EMA"):
            export_generator(gan, state.replace(g_ema=()), use_ema=True)

    def test_file_round_trip_and_framework_free_reload(self, trained_state,
                                                       tmp_path):
        """The artifact serves via jax.export alone — the consumer needs
        neither this package nor flax."""
        gan, state = trained_state
        path = tmp_path / "gen.jaxexport"
        path.write_bytes(export_generator(gan, state))
        serve = load_generator(path)
        z = gan.sample_latents(jax.random.PRNGKey(11), 2)
        via_loader = np.asarray(serve(z))

        from jax import export as jexport

        exported = jexport.deserialize(path.read_bytes())
        raw = np.asarray(exported.call(z))
        np.testing.assert_array_equal(via_loader, raw)
        assert serve.exported.in_avals[0].shape[1] == gan.latent_size
