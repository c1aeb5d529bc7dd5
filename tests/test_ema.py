"""Generator-parameter EMA (beyond-parity addition; the reference's state
capture, wgan.py:70-71, has no EMA — see train/config.py ema_decay docstring).

Pins: the in-step EMA recursion against a host-side replay, gating at
d_steps_per_g_step > 1, disabled-by-default state layout (no extra leaves),
EMA-aware sampling, checkpoint round-trip + both migration directions, and
chunked-mode equivalence with the host loop.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    CheckpointManager,
    GAN,
    Trainer,
    TrainerConfig,
    create_train_state,
    make_sample_fn,
    make_train_step,
)
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator

DECAY = 0.9  # aggressive so a few steps move the average measurably


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


def hparams(**kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("global_batch_size", 8)
    kw.setdefault("learning_rate", 1e-3)
    return BlurredWGANGPHyperParameters(**kw)


def run_steps(hp, n_steps, state=None, collect_params=False):
    gan = micro_gan()
    if state is None:
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
    step = make_train_step(gan, hp, donate_state=False)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (n_steps, 8, 16, 16, 1),
                               jnp.float32, -1.0, 1.0)
    trajectory = []
    for i in range(n_steps):
        state, metrics, _ = step(state, reals[i], jnp.float32(0.5),
                                 jax.random.PRNGKey(100 + i))
        if collect_params:
            trajectory.append((jax.tree_util.tree_map(np.asarray,
                                                      state.g_params),
                               bool(metrics["did_gen_step"])))
    return state, trajectory


class TestEMAStep:
    def test_disabled_by_default_no_extra_leaves(self):
        state, _ = run_steps(hparams(), 1)
        assert state.g_ema == ()
        assert jax.tree_util.tree_leaves(state.g_ema) == []

    def test_ema_matches_host_replay(self):
        """g_ema after k steps == the EMA recursion applied on host to the
        realised g_params trajectory (initialised at the init weights)."""
        hp = hparams(ema_decay=DECAY)
        gan = micro_gan()
        init = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        expect = jax.tree_util.tree_map(np.asarray, init.g_params)
        state, traj = run_steps(hp, 4, state=init, collect_params=True)
        for params, did_gen in traj:
            assert did_gen
            expect = jax.tree_util.tree_map(
                lambda e, p: e * DECAY + p * (1 - DECAY), expect, params)
        got = jax.tree_util.tree_map(np.asarray, state.g_ema)
        flat_e = jax.tree_util.tree_leaves(expect)
        flat_g = jax.tree_util.tree_leaves(got)
        for e, g in zip(flat_e, flat_g):
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)
        # ... and the average genuinely lags the live weights.
        dist = sum(float(np.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(got),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, state.g_params))))
        assert dist > 0

    def test_ema_frozen_on_skipped_gen_steps(self):
        hp = hparams(ema_decay=DECAY, d_steps_per_g_step=3)
        state, traj = run_steps(hp, 3, collect_params=True)
        # Steps: n_batches 0 (gen), 1 (skip), 2 (skip).
        assert [d for _, d in traj] == [True, False, False]
        # The skip steps (1, 2) must leave g_ema equal to the EMA after the
        # single gen step at n_batches == 0.
        after_gen = jax.tree_util.tree_map(np.asarray, state.g_ema)
        init = create_train_state(micro_gan(), hp, jax.random.PRNGKey(0),
                                  (16, 16, 1))
        expect = jax.tree_util.tree_map(
            lambda e, p: np.asarray(e) * DECAY + p * (1 - DECAY),
            init.g_params, traj[0][0])
        for e, g in zip(jax.tree_util.tree_leaves(expect),
                        jax.tree_util.tree_leaves(after_gen)):
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)

    def test_sample_fn_uses_ema_weights(self):
        hp = hparams(ema_decay=DECAY)
        gan = micro_gan()
        state, _ = run_steps(hp, 2)
        z = gan.sample_latents(jax.random.PRNGKey(7), 4)
        live = make_sample_fn(gan)(state, z)
        ema = make_sample_fn(gan, use_ema=True)(state, z)
        assert not np.allclose(np.asarray(live), np.asarray(ema))
        # use_ema output == applying g_ema directly as the parameters
        # (jit-fused vs eager: bit patterns may differ, values must not).
        direct, _ = gan.generate(state.g_ema, state.g_stats, z, train=False)
        np.testing.assert_allclose(np.asarray(ema), np.asarray(direct),
                                   rtol=1e-5, atol=1e-6)


class TestEMACheckpoint:
    def _save(self, tmp_path, state, name="ck"):
        """Save then CLOSE the manager: every restore below goes through a
        freshly constructed manager — the real resume/inference path, where
        metadata probing must work without a prior save on the instance
        (a same-instance restore hides a broken probe behind the save's
        handler registry)."""
        path = str(tmp_path / name)
        mngr = CheckpointManager(path)
        mngr.save(1, state)
        mngr.close()
        return CheckpointManager(path)

    def test_round_trip_with_ema(self, tmp_path):
        hp = hparams(ema_decay=DECAY)
        state, _ = run_steps(hp, 2)
        mngr = self._save(tmp_path, state)
        template = create_train_state(micro_gan(), hp, jax.random.PRNGKey(9),
                                      (16, 16, 1))
        restored, _, step = mngr.restore_latest(template)
        mngr.close()
        assert step == 1
        for a, b in zip(jax.tree_util.tree_leaves(state.g_ema),
                        jax.tree_util.tree_leaves(restored.g_ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_migration_seeds_ema_from_old_checkpoint(self, tmp_path):
        """Enabling EMA when resuming a pre-EMA run: g_ema is seeded from the
        restored generator weights."""
        old_state, _ = run_steps(hparams(), 2)  # ema disabled: g_ema == ()
        mngr = self._save(tmp_path, old_state)
        hp = hparams(ema_decay=DECAY)
        template = create_train_state(micro_gan(), hp, jax.random.PRNGKey(9),
                                      (16, 16, 1))
        restored, _, _ = mngr.restore_latest(template)
        mngr.close()
        for a, b in zip(jax.tree_util.tree_leaves(restored.g_ema),
                        jax.tree_util.tree_leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ema_checkpoint_restores_into_emaless_template(self, tmp_path):
        """The reverse direction (inference CLI built its template with
        default hparams): the saved average still restores."""
        hp = hparams(ema_decay=DECAY)
        state, _ = run_steps(hp, 2)
        mngr = self._save(tmp_path, state)
        template = create_train_state(micro_gan(), hparams(),
                                      jax.random.PRNGKey(9), (16, 16, 1))
        assert template.g_ema == ()
        restored, _, _ = mngr.restore_latest(template)
        mngr.close()
        for a, b in zip(jax.tree_util.tree_leaves(state.g_ema),
                        jax.tree_util.tree_leaves(restored.g_ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEMATrainer:
    def test_restore_trusts_state_over_missing_sidecar(self, tmp_path):
        """A run trained with EMA whose hyper_parameters.json sidecar is gone
        (copied run dir, sidecar-less launcher): a Trainer built with default
        hparams (ema_decay=0) must still sample the restored EMA weights when
        EMA sampling is requested — not silently fall back to live weights."""
        hp_train = hparams(ema_decay=DECAY)
        state, _ = run_steps(hp_train, 3)
        mngr = CheckpointManager(str(tmp_path / "checkpoints"))
        mngr.save(24, state)
        mngr.close()

        tr = Trainer(
            micro_gan(), hparams(),  # ema_decay=0: the sidecar-less default
            synthetic_dataset((16, 16, 1), num_examples=64),
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path), save_sample_pngs=False, seed=0))
        assert tr._use_ema  # derived from the restored state's g_ema leaves
        latents = tr.gan.sample_latents(jax.random.PRNGKey(7), 4)
        got = np.asarray(tr.sample_fn(tr.state, latents))
        want = np.asarray(make_sample_fn(tr.gan, use_ema=True)(
            tr.state, latents))
        np.testing.assert_array_equal(got, want)
        # And the weights genuinely differ, so the assertion has teeth.
        live = np.asarray(make_sample_fn(tr.gan, use_ema=False)(
            tr.state, latents))
        assert np.abs(got - live).max() > 0
        tr.close()

    def test_trainer_samples_with_ema_and_chunked_matches_host(self, tmp_path):
        """One Trainer fit with EMA on: grids sample the EMA weights, and the
        device-resident chunked path carries the identical g_ema as the
        host-driven loop over the same batches."""
        from blurred_gan_tpu.sched.blur import BlurDecayController

        hp = hparams(ema_decay=DECAY)
        ds = synthetic_dataset((16, 16, 1), num_examples=64)

        def build(subdir):
            return Trainer(
                micro_gan(), hp, ds,
                trainer_config=TrainerConfig(
                    log_dir=str(tmp_path / subdir),
                    sample_grid_every_n_examples=100_000,
                    checkpoint_every_n_examples=100_000,
                    save_sample_pngs=False, seed=0),
                blur_controller=BlurDecayController(640, max_value=1.0))

        tr_host = build("host")
        assert tr_host._use_ema
        state_host = tr_host.fit(total_examples=10_000, max_steps=8)
        tr_host.close()

        tr_chunk = build("chunk")
        state_chunk = tr_chunk.fit_device_resident(total_examples=10_000,
                                                   chunk_steps=4,
                                                   max_chunks=2)
        tr_chunk.close()
        assert jax.tree_util.tree_leaves(state_host.g_ema)
        for a, b in zip(jax.tree_util.tree_leaves(state_host.g_ema),
                        jax.tree_util.tree_leaves(state_chunk.g_ema)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)
