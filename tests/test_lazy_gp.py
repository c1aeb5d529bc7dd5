"""Lazy gradient-penalty regularisation (hparams.gp_every_n_steps).

StyleGAN2's lazy-regularisation argument applied to WGAN-GP: the penalty is
applied every N critic steps scaled by N, skipping the GP double-backward —
the most expensive part of the critic update — on the other steps. N=1 (the
default) is the reference's every-step semantics (wgan.py:272-285).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    create_train_state,
    make_train_step,
)

from test_train_loop import micro_gan, micro_hparams


def _run_steps(step, state, n, rng):
    out = []
    for i in range(n):
        reals = jax.random.uniform(jax.random.fold_in(rng, 500 + i),
                                   (8, 16, 16, 1), jnp.float32, -1, 1)
        state, metrics, _ = step(state, reals, jnp.float32(0.7),
                                 jax.random.fold_in(rng, i))
        out.append(metrics)
    return state, out


class TestLazyGP:
    def test_default_is_every_step(self):
        hp = micro_hparams()
        assert hp.gp_every_n_steps == 1
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
        step = make_train_step(gan, hp, donate_state=False)
        _, ms = _run_steps(step, state, 2, jax.random.PRNGKey(1))
        assert all(float(m["gp_term"]) > 0 for m in ms)

    def test_cadence_every_2(self):
        """gp_term is nonzero exactly on steps where n_batches % 2 == 0
        (evaluated before the increment — the generator gate's convention)."""
        hp = micro_hparams(gp_every_n_steps=2)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
        step = make_train_step(gan, hp, donate_state=False)
        _, ms = _run_steps(step, state, 4, jax.random.PRNGKey(1))
        gp = [float(m["gp_term"]) for m in ms]
        assert gp[0] > 0 and gp[2] > 0       # n_batches 0, 2
        assert gp[1] == 0.0 and gp[3] == 0.0  # n_batches 1, 3

    def test_applied_step_equals_scaled_every_step(self):
        """On a step where lazy GP fires, the update equals an every-step
        run whose gp_coefficient is pre-scaled by N (that IS the lazy
        semantics) — up to f32 fusion-ordering differences between the
        cond-wrapped and straight-line programs (XLA:CPU reassociates
        differently; observed 1-ulp loss deltas amplified through Adam's
        rsqrt to ~1e-4 relative on isolated elements)."""
        gan = micro_gan()
        hp_lazy = micro_hparams(gp_every_n_steps=3)
        hp_scaled = micro_hparams(
            gp_coefficient=hp_lazy.gp_coefficient * 3)
        state_a = create_train_state(gan, hp_lazy, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        state_b = create_train_state(gan, hp_scaled, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        step_a = make_train_step(gan, hp_lazy, donate_state=False)
        step_b = make_train_step(gan, hp_scaled, donate_state=False)
        rng = jax.random.PRNGKey(7)
        reals = jax.random.uniform(jax.random.fold_in(rng, 9),
                                   (8, 16, 16, 1), jnp.float32, -1, 1)
        # n_batches = 0 -> the lazy branch applies the (scaled) penalty.
        sa, ma, _ = step_a(state_a, reals, jnp.float32(0.7), rng)
        sb, mb, _ = step_b(state_b, reals, jnp.float32(0.7), rng)
        np.testing.assert_allclose(float(ma["gp_term"]), float(mb["gp_term"]),
                                   rtol=1e-6)
        for xa, xb in zip(jax.tree_util.tree_leaves(sa.d_params),
                          jax.tree_util.tree_leaves(sb.d_params)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=5e-4, atol=1e-5)

    def test_training_stays_finite(self):
        hp = micro_hparams(gp_every_n_steps=2)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                   (16, 16, 1))
        step = make_train_step(gan, hp, donate_state=False)
        state, ms = _run_steps(step, state, 4, jax.random.PRNGKey(3))
        assert all(np.isfinite(float(m["disc_loss"])) for m in ms)
        assert all(np.isfinite(float(m["gen_loss"])) for m in ms)
        assert int(state.n_batches) == 4

    def test_chunked_matches_host_loop(self, tmp_path):
        """Lazy GP under the scanned device-resident path ≡ the host loop
        (the cond's counter-gating must survive lax.scan)."""
        from blurred_gan_tpu.data import synthetic_dataset
        from blurred_gan_tpu.sched.blur import BlurDecayController
        from blurred_gan_tpu.train import Trainer, TrainerConfig

        def mk(subdir):
            cfg = TrainerConfig(log_dir=str(tmp_path / subdir),
                                log_metrics_every_n_examples=16,
                                checkpoint_every_n_examples=1_000_000,
                                sample_grid_every_n_examples=1_000_000,
                                image_summaries_interval_batches=0,
                                save_sample_pngs=False, seed=0)
            return Trainer(micro_gan(), micro_hparams(gp_every_n_steps=2),
                           synthetic_dataset((16, 16, 1), num_examples=64),
                           trainer_config=cfg,
                           blur_controller=BlurDecayController(
                               640, max_value=1.0))

        tr_a = mk("host")
        state_a = tr_a.fit(total_examples=10_000, max_steps=4)
        tr_a.close()
        tr_b = mk("chunked")
        state_b = tr_b.fit_device_resident(total_examples=10_000,
                                           chunk_steps=2, max_chunks=2)
        tr_b.close()
        assert int(state_a.n_batches) == int(state_b.n_batches) == 4
        for xa, xb in zip(jax.tree_util.tree_leaves(state_a.d_params),
                          jax.tree_util.tree_leaves(state_b.d_params)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=5e-4, atol=5e-5)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_lazy_gp_on_mesh_matches_single_device(self):
        """The counter-gated cond must survive GSPMD partitioning: a lazy-GP
        step on the 8-device data mesh equals the single-device step."""
        from blurred_gan_tpu.parallel import make_mesh

        gan = micro_gan()
        hp = micro_hparams(gp_every_n_steps=2)
        mesh = make_mesh(8)
        state_a = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        state_b = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        step_1 = make_train_step(gan, hp, donate_state=False)
        step_8 = make_train_step(gan, hp, mesh=mesh, donate_state=False)
        rng = jax.random.PRNGKey(11)
        for i in range(2):  # step 0 applies GP, step 1 skips it
            reals = jax.random.uniform(jax.random.fold_in(rng, 40 + i),
                                       (8, 16, 16, 1), jnp.float32, -1, 1)
            k = jax.random.fold_in(rng, i)
            state_a, ma, _ = step_1(state_a, reals, jnp.float32(0.7), k)
            state_b, mb, _ = step_8(state_b, reals, jnp.float32(0.7), k)
            np.testing.assert_allclose(float(ma["gp_term"]),
                                       float(mb["gp_term"]), rtol=1e-4)
        assert float(ma["gp_term"]) == 0.0  # second step skipped the GP
        for xa, xb in zip(jax.tree_util.tree_leaves(state_a.d_params),
                          jax.tree_util.tree_leaves(state_b.d_params)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=5e-4, atol=1e-5)

    def test_config_roundtrip(self, tmp_path):
        hp = BlurredWGANGPHyperParameters(gp_every_n_steps=4)
        p = tmp_path / "hp.json"
        hp.save_json(str(p))
        hp2 = BlurredWGANGPHyperParameters.from_json(str(p))
        assert hp2.gp_every_n_steps == 4
