"""Integration tests: short end-to-end runs of the Trainer (SURVEY.md §4.2).

Uses a micro GAN (tiny DCGAN pair at 16x16) so CPU compiles stay fast.
"""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.metrics import SWDMetric
from blurred_gan_tpu.sched.blur import AdaptiveBlurController, BlurDecayController
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    MetricFeeder,
    Trainer,
    TrainerConfig,
    wide_value,
)


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


def micro_hparams(**kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("global_batch_size", 8)
    kw.setdefault("learning_rate", 1e-3)
    return BlurredWGANGPHyperParameters(**kw)


def make_trainer(tmp_path, subdir="run", **kw):
    ds = synthetic_dataset((16, 16, 1), num_examples=64)
    cfg = TrainerConfig(
        log_dir=str(tmp_path / subdir),
        log_metrics_every_n_examples=16,
        sample_grid_every_n_examples=100_000,  # off unless testing
        checkpoint_every_n_examples=kw.pop("ckpt_every", 64),
        save_sample_pngs=kw.pop("save_pngs", False),
        seed=0,
    )
    return Trainer(
        micro_gan(), micro_hparams(), ds, trainer_config=cfg,
        blur_controller=kw.pop("blur_controller",
                               BlurDecayController(640, max_value=1.0)),
        **kw)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One short run shared by the cheap assertions below."""
    tmp_path = tmp_path_factory.mktemp("trainer")
    tr = make_trainer(tmp_path)
    state = tr.fit(total_examples=10_000, max_steps=12)
    yield tr, state, tmp_path
    tr.close()


class TestTrainingRun:
    def test_counters_advance(self, trained):
        tr, state, _ = trained
        assert int(state.n_batches) == 12
        assert wide_value(state.n_img) == 96

    def test_losses_finite_and_logged(self, trained):
        tr, state, _ = trained
        logs = tr._last_metrics
        assert np.isfinite(logs["disc_loss"])
        assert np.isfinite(logs["gp_term"])
        assert logs["std"] <= 1.0

    def test_sigma_follows_schedule(self, trained):
        tr, _, _ = trained
        # after 12 batches the open-loop schedule has decayed sigma
        assert tr._last_metrics["std"] == pytest.approx(
            1.0 * 0.96 ** (11 / 64.0), rel=1e-4)

    def test_events_jsonl_written(self, trained):
        tr, _, tmp_path = trained
        events = os.path.join(tr.cfg.log_dir, "events.jsonl")
        assert os.path.exists(events)
        assert sum(1 for _ in open(events)) >= 3

    def test_checkpoint_written(self, trained):
        tr, _, _ = trained
        assert tr.ckpt.latest_step() == 96

    def test_run_manifest_written(self, trained):
        import json

        tr, _, _ = trained
        path = os.path.join(tr.cfg.log_dir, "run_manifest.json")
        assert os.path.exists(path)
        with open(path) as f:
            manifest = json.load(f)
        assert manifest["image_shape"] == list(tr.dataset.image_shape)
        assert manifest["dataset"] == tr.dataset.name
        assert manifest["latent_size"] == tr.gan.latent_size

    def test_epoch_scalars_written(self, trained):
        # 64 examples at bs 8 -> epoch boundary at step 8 of the 12-step run;
        # the reference's LogMetricsCallback epoch_* tier (callbacks.py:262-268).
        import json

        tr, _, _ = trained
        events = os.path.join(tr.cfg.log_dir, "events.jsonl")
        recs = [json.loads(line) for line in open(events)]
        epoch_recs = [r for r in recs if "epoch_disc_loss" in r]
        assert epoch_recs and epoch_recs[0]["epoch_epoch"] == 1.0

    def test_image_summaries_include_blur_pairs(self, trained):
        # Before/after views on BOTH branches (gaussian_blur.py:145-148).
        tr, _, _ = trained
        tags = []
        orig = tr.logger.image
        tr.logger.image = lambda step, tag, img: tags.append(tag)
        try:
            x = np.zeros((4, 16, 16, 1), np.float32)
            tr._image_summaries(x, x.copy(), 1.0)
        finally:
            tr.logger.image = orig
        assert {"train/reals", "train/reals_blurred",
                "train/fakes", "train/fakes_blurred"} <= set(tags)


class TestCheckpointResume:
    def test_resume_bit_exact(self, tmp_path):
        # Run A: 8 steps straight through.
        tr_a = make_trainer(tmp_path, subdir="a", ckpt_every=100_000)
        state_a = tr_a.fit(total_examples=10_000, max_steps=8)
        tr_a.close()

        # Run B: 4 steps, checkpoint, then a fresh Trainer resumes for 4 more.
        tr_b1 = make_trainer(tmp_path, subdir="b", ckpt_every=100_000)
        tr_b1.fit(total_examples=10_000, max_steps=4)
        tr_b1.close()
        tr_b2 = make_trainer(tmp_path, subdir="b", ckpt_every=100_000)
        assert int(tr_b2.state.n_batches) == 4  # restored
        state_b = tr_b2.fit(total_examples=10_000, max_steps=4)
        tr_b2.close()

        # Same final counters and bit-identical parameters/opt state.
        assert int(state_a.n_batches) == int(state_b.n_batches) == 8
        for xa, xb in zip(jax.tree_util.tree_leaves(state_a),
                          jax.tree_util.tree_leaves(state_b)):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    def test_adaptive_state_checkpoints(self, tmp_path):
        ada = AdaptiveBlurController(warmup_n_batches=0,
                                     delay_between_modifications=1,
                                     max_value=1.0)
        tr = make_trainer(tmp_path, subdir="ada", blur_controller=None,
                          adaptive_controller=ada, ckpt_every=32)
        tr.fit(total_examples=10_000, max_steps=6)
        saved_std = tr.ada_state.std
        tr.close()
        assert saved_std < 1.0  # decayed at least once

        tr2 = make_trainer(tmp_path, subdir="ada", blur_controller=None,
                           adaptive_controller=ada, ckpt_every=32)
        assert tr2.ada_state.std == pytest.approx(saved_std)
        tr2.close()


class TestSampleGridAndFeeders:
    def test_sample_grid_png(self, tmp_path):
        tr = make_trainer(tmp_path, subdir="grid", save_pngs=True)
        tr.cfg.sample_grid_every_n_examples = 32
        tr._build_hooks()
        tr.fit(total_examples=10_000, max_steps=5)
        pngs = glob.glob(os.path.join(tr.cfg.log_dir, "samples_grid_*.png"))
        tr.close()
        assert len(pngs) >= 1

    def test_swd_feeder_fires(self, tmp_path):
        feeder = MetricFeeder(SWDMetric(nhoods_per_image=16),
                              every_n_examples=64, num_samples=16, name="swd")
        ds = synthetic_dataset((16, 16, 1), num_examples=64)
        cfg = TrainerConfig(log_dir=str(tmp_path / "feeder"),
                            checkpoint_every_n_examples=100_000,
                            sample_grid_every_n_examples=100_000, seed=0)
        tr = Trainer(micro_gan(), micro_hparams(), ds, trainer_config=cfg,
                     blur_controller=BlurDecayController(640, max_value=1.0),
                     metric_feeders=[feeder])
        tr.fit(total_examples=10_000, max_steps=10)
        events = open(os.path.join(tr.cfg.log_dir, "events.jsonl")).read()
        tr.close()
        assert "swd/SWDx1e3_16" in events


class TestExportWeights:
    def test_msgpack_roundtrip(self, trained, tmp_path):
        import flax.serialization as fser
        import jax

        tr, state, _ = trained
        d = tmp_path / "weights"
        tr.export_weights(str(d))
        with open(d / "generator.msgpack", "rb") as f:
            g = fser.from_bytes({"params": state.g_params,
                                 "batch_stats": state.g_stats}, f.read())
        for a, b in zip(jax.tree_util.tree_leaves(g["params"]),
                        jax.tree_util.tree_leaves(state.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (d / "discriminator.msgpack").exists()


class TestEvaluate:
    def test_on_demand_eval(self, trained):
        from blurred_gan_tpu.metrics import SWDMetric

        tr, _, _ = trained
        out = tr.evaluate(num_samples=16,
                          metrics=[SWDMetric(nhoods_per_image=16)])
        assert "SWDx1e3_16" in out and "SWDx1e3_avg" in out
        assert np.isfinite(out["SWDx1e3_avg"])


class TestCheckpointRetention:
    def test_max_to_keep(self, tmp_path):
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3,
                                 keep_time_interval_hours=None)
        state = {"w": jnp.arange(4.0)}
        for step in range(100, 800, 100):
            ckpt.save(step, state)
        ckpt.wait_until_finished()
        kept = sorted(int(d) for d in os.listdir(tmp_path / "ck")
                      if d.isdigit())
        assert kept == [500, 600, 700]
        restored = ckpt.restore_latest(state)
        assert restored is not None and restored[2] == 700
        ckpt.close()
