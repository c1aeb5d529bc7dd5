"""Tests for device-resident chunked training (train/fast.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.sched.blur import (
    AdaptiveBlurController,
    BlurDecayController,
)
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    Trainer,
    TrainerConfig,
    wide_value,
)
from blurred_gan_tpu.train.fast import (
    AdaptiveState,
    adaptive_update,
    chunk_indices,
)


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


def hparams():
    return BlurredWGANGPHyperParameters(batch_size=8, global_batch_size=8)


def mk_trainer(tmp_path, subdir, **kw):
    cfg = TrainerConfig(log_dir=str(tmp_path / subdir),
                        log_metrics_every_n_examples=16,
                        checkpoint_every_n_examples=1_000_000,
                        sample_grid_every_n_examples=1_000_000,
                        image_summaries_interval_batches=0,
                        save_sample_pngs=False, seed=0)
    return Trainer(micro_gan(), hparams(),
                   synthetic_dataset((16, 16, 1), num_examples=64),
                   trainer_config=cfg, **kw)


class TestAdaptiveDeviceHostEquivalence:
    def test_transition_matches_host_controller(self):
        c = AdaptiveBlurController(warmup_n_batches=3,
                                   delay_between_modifications=2,
                                   max_value=5.0, threshold=0.05)
        host = c.init()
        dev = AdaptiveState.init(c)
        rng = np.random.RandomState(0)
        for b in range(1, 40):
            fake = float(abs(rng.randn()) + 0.5)
            real = float(abs(rng.randn()) + 0.5)
            host, _ = c.update(host, b, fake, real)
            dev = adaptive_update(c, dev, jnp.int32(b), jnp.float32(fake),
                                  jnp.float32(real))
            assert float(dev.std) == pytest.approx(host.std, rel=1e-5), b
            assert float(dev.score_ratio) == pytest.approx(host.score_ratio,
                                                           rel=1e-4)
            assert int(dev.last_modification_batch) == \
                host.last_modification_batch
            assert bool(dev.stop_training) == host.stop_training


class TestChunkIndices:
    def test_continues_dataset_stream(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=64, seed=1)
        # host stream: 10 batches of 8 from the epoch-seeded permutation
        direct = [b.copy() for _, b in zip(range(10), ds.batches(8, seed=5))]
        idx = chunk_indices(64, 8, 10, start_batch_counter=0, seed=5)
        for i in range(10):
            np.testing.assert_array_equal(ds.images[idx[i]], direct[i])

    def test_resume_mid_stream(self):
        idx_all = chunk_indices(64, 8, 10, 0, seed=5)
        idx_tail = chunk_indices(64, 8, 4, 6, seed=5)
        np.testing.assert_array_equal(idx_all[6:], idx_tail)


class TestChunkedFit:
    def test_matches_host_loop(self, tmp_path):
        # 6 steps chunked == 6 steps host-driven (same data, RNG, sigma).
        tr_a = mk_trainer(tmp_path, "host",
                          blur_controller=BlurDecayController(640,
                                                              max_value=1.0))
        state_a = tr_a.fit(total_examples=10_000, max_steps=6)
        tr_a.close()

        tr_b = mk_trainer(tmp_path, "chunked",
                          blur_controller=BlurDecayController(640,
                                                              max_value=1.0))
        state_b = tr_b.fit_device_resident(total_examples=10_000,
                                           chunk_steps=3, max_chunks=2)
        tr_b.close()

        assert int(state_a.n_batches) == int(state_b.n_batches) == 6
        for xa, xb in zip(jax.tree_util.tree_leaves(state_a.d_params),
                          jax.tree_util.tree_leaves(state_b.d_params)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=5e-4, atol=5e-5)

    def test_adaptive_chunked_runs_and_mirrors_state(self, tmp_path):
        ada = AdaptiveBlurController(warmup_n_batches=0,
                                     delay_between_modifications=1,
                                     max_value=1.0)
        tr = mk_trainer(tmp_path, "ada", adaptive_controller=ada)
        tr.fit_device_resident(total_examples=10_000, chunk_steps=4,
                               max_chunks=2)
        assert tr.ada_state is not None
        assert tr.ada_state.std < 1.0  # decayed on device
        assert tr.ada_state.last_modification_batch > 0
        tr.close()


class TestChunkedMesh:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_chunked_on_mesh_matches_single_device(self):
        from jax.sharding import Mesh
        from blurred_gan_tpu.train import create_train_state
        from blurred_gan_tpu.train.fast import make_chunked_train_fn

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=16)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        ds = synthetic_dataset((16, 16, 1), num_examples=64)
        data = jnp.asarray(ds.images)
        bc = BlurDecayController(640, max_value=1.0)
        ada = AdaptiveState(jnp.float32(0), jnp.float32(0.5), jnp.int32(0),
                            jnp.bool_(False))
        idx = jnp.asarray(chunk_indices(64, 16, 3, 0, 0))
        rng = jax.random.PRNGKey(1)

        fn1 = make_chunked_train_fn(gan, hp, 3, blur_controller=bc)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        fn8 = make_chunked_train_fn(gan, hp, 3, mesh=mesh,
                                    blur_controller=bc)
        # chunk fns donate their input state — use a fresh (identical) state
        # for the second call.
        state2 = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                    (16, 16, 1))
        s1, _, m1, p1 = fn1(state, ada, data, idx, rng)
        s8, _, m8, _ = fn8(state2, ada, data, idx, rng)
        np.testing.assert_allclose(np.asarray(m1["disc_loss"]),
                                   np.asarray(m8["disc_loss"]),
                                   rtol=3e-4, atol=3e-5)
        # The packed matrix is the same data as the dict, key-sorted columns.
        keys = sorted(m1)
        assert np.asarray(p1).shape == (3, len(keys))
        np.testing.assert_allclose(
            np.asarray(p1)[:, keys.index("disc_loss")],
            np.asarray(m1["disc_loss"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                        jax.tree_util.tree_leaves(s8.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5)


class TestChunkedStopFreeze:
    def test_steps_after_stop_are_noops(self, tmp_path):
        # min_value just below max: the first decay triggers stop; the
        # remaining steps of the chunk must not touch the state (matching a
        # host loop that stops dispatching).
        ada = AdaptiveBlurController(warmup_n_batches=0,
                                     delay_between_modifications=1,
                                     max_value=1.0, min_value=0.995)
        tr = mk_trainer(tmp_path, "stop", adaptive_controller=ada)
        state = tr.fit_device_resident(total_examples=10_000, chunk_steps=6,
                                       max_chunks=5)
        tr.close()
        assert tr.ada_state.stop_training
        # The first decay pushes std below min_value; all later steps of the
        # chunk are frozen no-ops, so the device batch counter stops at the
        # triggering step, and the host mirrors track it exactly (the final
        # checkpoint is keyed by the true examples count).
        assert int(state.n_batches) == tr.ada_state.last_modification_batch
        assert int(state.n_batches) <= 2  # first stable EMA reading
        assert tr._n_batches_host == int(state.n_batches)
        assert tr.samples_seen == wide_value(state.n_img)

    def test_resume_of_stopped_run_stays_stopped(self, tmp_path):
        ada = AdaptiveBlurController(warmup_n_batches=0,
                                     delay_between_modifications=1,
                                     max_value=1.0, min_value=0.995)
        tr = mk_trainer(tmp_path, "stop2", adaptive_controller=ada)
        tr.fit_device_resident(total_examples=10_000, chunk_steps=6,
                               max_chunks=5)
        n = tr._n_batches_host
        tr.close()
        tr2 = mk_trainer(tmp_path, "stop2", adaptive_controller=ada)
        assert tr2._stop  # restored as complete
        tr2.fit_device_resident(total_examples=10_000, chunk_steps=6)
        assert tr2._n_batches_host == n  # no phantom chunks dispatched
        tr2.close()
