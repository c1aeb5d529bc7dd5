"""Round-3 regression tests (VERDICT.md round 2: weak #1-#4, missing #2).

Covers: the d_steps==1 train-step specialisation, gen_loss carry on skipped
generator steps, raw-by-default sample grids, the device-resident metric
cadence, FID shifted-moment precision at protocol scale, and the
metadata-driven legacy-checkpoint decision.
"""

import dataclasses
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.metrics import SWDMetric
from blurred_gan_tpu.metrics.fid import FeatureStats
from blurred_gan_tpu.sched.blur import BlurDecayController
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    MetricFeeder,
    Trainer,
    TrainerConfig,
    create_train_state,
    make_train_step,
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


def make_trainer(tmp_path, subdir="run", hparams=None, **kw):
    ds = synthetic_dataset((16, 16, 1), num_examples=64)
    cfg_kw = dict(
        log_dir=str(tmp_path / subdir),
        log_metrics_every_n_examples=kw.pop("log_every", 16),
        sample_grid_every_n_examples=100_000,
        checkpoint_every_n_examples=kw.pop("ckpt_every", 100_000),
        save_sample_pngs=False,
        seed=0,
    )
    cfg_kw.update(kw.pop("cfg_kw", {}))
    return Trainer(
        micro_gan(), hparams or micro_hparams(), ds,
        trainer_config=TrainerConfig(**cfg_kw),
        blur_controller=kw.pop("blur_controller",
                               BlurDecayController(640, max_value=1.0)),
        **kw)


# ---------------------------------------------------------------------------
# d_steps_per_g_step == 1 specialisation (VERDICT weak #2)
# ---------------------------------------------------------------------------


class _OpaqueOne(int):
    """An int whose value is 1 but which fails the ``== 1`` specialisation
    check — forces make_train_step down the generic lax.cond path with
    identical semantics, for an apples-to-apples equivalence test."""

    def __eq__(self, other):
        return False

    def __ne__(self, other):
        return True

    __hash__ = int.__hash__


class TestGenStepSpecialisation:
    def test_specialised_step_matches_cond_path(self):
        gan = micro_gan()
        hp = micro_hparams()
        assert hp.d_steps_per_g_step == 1
        hp_cond = dataclasses.replace(hp,
                                      d_steps_per_g_step=_OpaqueOne(1))
        step_fast = make_train_step(gan, hp, donate_state=False)
        step_cond = make_train_step(gan, hp_cond, donate_state=False)

        state_a = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        state_b = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                     (16, 16, 1))
        rng = jax.random.PRNGKey(7)
        for i in range(3):
            reals = jax.random.uniform(jax.random.fold_in(rng, 100 + i),
                                       (8, 16, 16, 1), jnp.float32, -1, 1)
            k = jax.random.fold_in(rng, i)
            state_a, ma, _ = step_fast(state_a, reals, jnp.float32(0.5), k)
            state_b, mb, _ = step_cond(state_b, reals, jnp.float32(0.5), k)
            assert bool(ma["did_gen_step"]) and bool(mb["did_gen_step"])
            np.testing.assert_allclose(float(ma["gen_loss"]),
                                       float(mb["gen_loss"]), rtol=2e-5)
        # atol matters: XLA:CPU fuses the cond-wrapped generator branch
        # differently from the straight-line program, giving ~1e-7-level
        # per-step float differences that 3 training steps amplify to ~2e-6
        # ABSOLUTE on near-zero Adam moments (relative error there is pure
        # noise amplification; measured max abs dev 1.7e-6, and on TPU the
        # two programs are bit-identical — deviation exactly 0).
        for xa, xb in zip(jax.tree_util.tree_leaves(state_a),
                          jax.tree_util.tree_leaves(state_b)):
            np.testing.assert_allclose(np.asarray(xa, np.float64),
                                       np.asarray(xb, np.float64),
                                       rtol=3e-5, atol=2e-5)

    def test_d2_still_gates_gen_updates(self):
        gan = micro_gan()
        hp = micro_hparams(d_steps_per_g_step=2)
        step = make_train_step(gan, hp, donate_state=False)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        reals = jax.random.uniform(jax.random.PRNGKey(5), (8, 16, 16, 1),
                                   jnp.float32, -1, 1)
        flags = []
        for i in range(4):
            state, m, _ = step(state, reals, jnp.float32(0.5),
                               jax.random.PRNGKey(i))
            flags.append(bool(m["did_gen_step"]))
        assert flags == [True, False, True, False]


# ---------------------------------------------------------------------------
# gen_loss carry on skipped gen steps (VERDICT weak #4)
# ---------------------------------------------------------------------------


class TestGenLossCarry:
    def test_fill_helper(self, tmp_path):
        tr = make_trainer(tmp_path, subdir="carry_unit")
        logs = {"gen_loss": 1.5, "did_gen_step": 1.0}
        tr._fill_gen_loss(logs)
        assert logs["gen_loss"] == 1.5
        skipped = {"gen_loss": 0.0, "did_gen_step": 0.0}
        tr._fill_gen_loss(skipped)
        assert skipped["gen_loss"] == 1.5  # carried
        # A fresh real value replaces the carry.
        logs2 = {"gen_loss": -0.3, "did_gen_step": 1.0}
        tr._fill_gen_loss(logs2)
        skipped2 = {"gen_loss": 0.0, "did_gen_step": 0.0}
        tr._fill_gen_loss(skipped2)
        assert skipped2["gen_loss"] == -0.3
        tr.close()

    def test_logged_stream_has_no_structural_zeros(self, tmp_path):
        tr = make_trainer(tmp_path, subdir="carry",
                          hparams=micro_hparams(d_steps_per_g_step=2),
                          log_every=8)  # log every step at bs 8
        tr.fit(total_examples=10_000, max_steps=6)
        events = os.path.join(tr.cfg.log_dir, "events.jsonl")
        recs = [json.loads(line) for line in open(events)]
        tr.close()
        rows = [r for r in recs if "batch_gen_loss" in r]
        assert len(rows) >= 4
        last_real = None
        saw_skip = False
        for r in rows:
            if r["batch_did_gen_step"]:
                last_real = r["batch_gen_loss"]
            else:
                saw_skip = True
                assert last_real is not None
                assert r["batch_gen_loss"] == pytest.approx(last_real)
        assert saw_skip  # d=2 produced skipped steps in the log


# ---------------------------------------------------------------------------
# Raw-by-default sample grids (VERDICT weak #1)
# ---------------------------------------------------------------------------


class TestSampleGridRaw:
    def _grids(self, tr):
        from blurred_gan_tpu.utils.images import normalize_images, samples_grid

        captured = {}
        orig = tr.logger.image
        tr.logger.image = lambda step, tag, img: captured.__setitem__(tag, img)
        try:
            tr._sample_grid(0, {})
        finally:
            tr.logger.image = orig
        raw = np.asarray(tr.sample_fn(tr.state, tr.grid_latents))
        expected = samples_grid(normalize_images(raw))
        return captured, expected

    def test_primary_grid_is_raw(self, tmp_path):
        tr = make_trainer(tmp_path, subdir="grid_raw")
        tr._current_sigma = 2.0
        captured, expected = self._grids(tr)
        tr.close()
        assert "samples_grid" in captured
        np.testing.assert_array_equal(captured["samples_grid"], expected)
        # The blurred view is an extra tag and differs from the raw grid.
        assert "samples_grid_blurred" in captured
        assert not np.array_equal(captured["samples_grid_blurred"], expected)

    def test_blurred_tag_optional(self, tmp_path):
        tr = make_trainer(tmp_path, subdir="grid_noblur",
                          cfg_kw={"show_blurred_samples": False})
        tr._current_sigma = 2.0
        captured, expected = self._grids(tr)
        tr.close()
        np.testing.assert_array_equal(captured["samples_grid"], expected)
        assert "samples_grid_blurred" not in captured


# ---------------------------------------------------------------------------
# Device-resident metric cadence (VERDICT missing #2)
# ---------------------------------------------------------------------------


class TestChunkedMetricCadence:
    def test_feeder_fires_at_chunk_boundaries(self, tmp_path):
        feeder = MetricFeeder(SWDMetric(nhoods_per_image=16),
                              every_n_examples=32, num_samples=16, name="swd")
        tr = make_trainer(tmp_path, subdir="chunked_eval",
                          metric_feeders=[feeder])
        tr.fit_device_resident(total_examples=64, chunk_steps=4)
        events = open(os.path.join(tr.cfg.log_dir, "events.jsonl")).read()
        tr.close()
        assert "swd/SWDx1e3_16" in events
        # The feeder completed (not left mid-recording at run end).
        assert not feeder.recording


# ---------------------------------------------------------------------------
# FID shifted-moment precision at protocol scale (VERDICT weak #3)
# ---------------------------------------------------------------------------


class TestFeatureStatsPrecision:
    def test_matches_f64_cov_at_50k_with_offset_means(self):
        rng = np.random.RandomState(0)
        d, n, bs = 128, 50_000, 2_500
        # Strong mean offset (|mu| >> std): the regime where unshifted f32
        # SSxxT - n*mu*muT accumulation loses digits to cancellation.
        feats = (rng.randn(n, d) * 3.0 + 50.0).astype(np.float32)
        fs = FeatureStats(d)
        for i in range(0, n, bs):
            fs.update(jnp.asarray(feats[i:i + bs]))
        mu, sig = fs.finalize()
        f64 = feats.astype(np.float64)
        ref_mu = f64.mean(0)
        ref_cov = np.cov(f64, rowvar=False)
        mu_rel = (np.linalg.norm(mu - ref_mu)
                  / np.linalg.norm(ref_mu))
        cov_rel = (np.linalg.norm(sig - ref_cov)
                   / np.linalg.norm(ref_cov))
        assert mu_rel < 1e-6, mu_rel
        assert cov_rel < 1e-4, cov_rel  # documented bound (fid.py docstring)

    def test_reset_clears_shift(self):
        fs = FeatureStats(4)
        fs.update(jnp.ones((8, 4)) * 100.0)
        fs.reset()
        assert fs.shift is None
        # A fresh stream with a different offset is unaffected by the old one.
        x = np.random.RandomState(1).randn(64, 4).astype(np.float32)
        for i in range(0, 64, 16):
            fs.update(jnp.asarray(x[i:i + 16]))
        mu, sig = fs.finalize()
        np.testing.assert_allclose(mu, x.astype(np.float64).mean(0),
                                   atol=1e-5)
        np.testing.assert_allclose(
            sig, np.cov(x.astype(np.float64), rowvar=False), atol=1e-5)


# ---------------------------------------------------------------------------
# Cross-process metric aggregation (round-2 ADVICE #3, solved not documented)
# ---------------------------------------------------------------------------


class TestCrossProcessMetricMerge:
    def test_fid_moment_merge_matches_f64_cov_of_union(self):
        from blurred_gan_tpu.metrics.fid import merge_feature_moments

        rng = np.random.RandomState(0)
        d = 32
        x1 = (rng.randn(300, d) * 2 + 5).astype(np.float32)
        x2 = (rng.randn(500, d) * 3 - 2).astype(np.float32)  # different dist
        a, b = FeatureStats(d), FeatureStats(d)
        for i in range(0, 300, 100):
            a.update(jnp.asarray(x1[i:i + 100]))
        for i in range(0, 500, 100):
            b.update(jnp.asarray(x2[i:i + 100]))
        n, mu, sig = merge_feature_moments([a.moments(), b.moments()])
        union = np.concatenate([x1, x2]).astype(np.float64)
        assert n == 800
        np.testing.assert_allclose(mu, union.mean(0), atol=1e-5)
        np.testing.assert_allclose(sig, np.cov(union, rowvar=False),
                                   rtol=1e-4, atol=1e-5)

    def test_fid_metric_cross_process_merge_equals_union_fid(self):
        from blurred_gan_tpu.metrics import FIDMetric
        from blurred_gan_tpu.metrics.fid import calculate_fid

        rng = np.random.RandomState(1)
        feat = lambda n, off: (rng.randn(n, 8) + off).astype(np.float32)
        r1, f1 = feat(64, 0.0), feat(64, 1.0)
        r2, f2 = feat(64, 0.2), feat(64, 0.8)
        ident = lambda x: jnp.asarray(x).reshape(x.shape[0], -1)

        proc_a = FIDMetric(feature_fn=ident)
        proc_b = FIDMetric(feature_fn=ident)
        proc_a.update_state(r1[:, :, None, None], f1[:, :, None, None])
        proc_b.update_state(r2[:, :, None, None], f2[:, :, None, None])

        # Fake 2-process allgather: proc B's arrays arrive in the same call
        # order cross_process_merge requests proc A's.
        queue = []
        for stats in (proc_b._real, proc_b._fake):
            n, mu, m2 = stats.moments()
            queue += [np.float64([n]), mu, m2]
        proc_a.cross_process_merge(lambda x: [np.asarray(x), queue.pop(0)])

        expect = calculate_fid(np.concatenate([r1, r2]),
                               np.concatenate([f1, f2]))
        assert proc_a.result() == pytest.approx(expect, rel=1e-6)

    def test_swd_descriptor_merge_equals_single_metric(self):
        b1 = np.random.RandomState(2).rand(8, 16, 16, 1).astype(np.float32)
        b2 = np.random.RandomState(3).rand(8, 16, 16, 1).astype(np.float32)
        f1 = np.random.RandomState(4).rand(8, 16, 16, 1).astype(np.float32)
        f2 = np.random.RandomState(5).rand(8, 16, 16, 1).astype(np.float32)

        single = SWDMetric(nhoods_per_image=16)
        single.update_state(b1, f1)
        single.update_state(b2, f2)
        expect = single.results()

        proc_a = SWDMetric(nhoods_per_image=16)
        proc_a.update_state(b1, f1)
        proc_b = SWDMetric(nhoods_per_image=16)
        proc_b._build(16, 1)
        proc_b._n_updates = 1  # align the per-update patch RNG with `single`
        proc_b.update_state(b2, f2)

        queue = []
        for bank in (proc_b.real_descriptors, proc_b.fake_descriptors):
            for descs in bank:
                queue.append(np.asarray(jnp.concatenate(descs, axis=0)))
        proc_a.cross_process_merge(lambda x: [np.asarray(x), queue.pop(0)])
        got = proc_a.results()
        for k, v in expect.items():
            assert got[k] == pytest.approx(v, rel=1e-4), k


# ---------------------------------------------------------------------------
# Generator dtype-boundary fast paths (round-3 profile-guided study)
# ---------------------------------------------------------------------------


class TestFastGenOptions:
    def test_same_params_and_close_outputs(self):
        from blurred_gan_tpu.models import DCGANGenerator

        kw = dict(latent_size=16, init_hw=(4, 4), init_features=32,
                  blocks=((32, 2), (16, 2)), out_channels=1,
                  final_transpose=False, final_stride=1)
        z = jax.random.uniform(jax.random.PRNGKey(0), (4, 16))
        g_ref = DCGANGenerator(**kw, compute_dtype=jnp.bfloat16)
        g_fast = DCGANGenerator(**kw, compute_dtype=jnp.bfloat16,
                                bn_dtype=jnp.bfloat16, output_f32=False)
        v_ref = g_ref.init(jax.random.PRNGKey(1), z, train=False)
        v_fast = g_fast.init(jax.random.PRNGKey(1), z, train=False)
        # The dtype flags move computation boundaries only — parameters and
        # their dtypes are identical.
        for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                        jax.tree_util.tree_leaves(v_fast)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        y_ref, _ = g_ref.apply(v_ref, z, train=True, mutable=["batch_stats"])
        y_fast, _ = g_fast.apply(v_fast, z, train=True,
                                 mutable=["batch_stats"])
        assert y_ref.dtype == jnp.float32
        assert y_fast.dtype == jnp.bfloat16
        d = np.abs(np.asarray(y_ref, np.float32)
                   - np.asarray(y_fast, np.float32))
        assert d.max() < 0.05  # bf16 rounding only, same function

    def test_default_path_unchanged(self):
        """bn_dtype=None must be exactly the old f32-BN behaviour."""
        from blurred_gan_tpu.models import DCGANGenerator

        kw = dict(latent_size=16, init_hw=(4, 4), init_features=32,
                  blocks=((32, 2),), out_channels=1,
                  final_transpose=False, final_stride=1)
        z = jax.random.uniform(jax.random.PRNGKey(0), (2, 16))
        g_a = DCGANGenerator(**kw)
        g_b = DCGANGenerator(**kw, bn_dtype=jnp.float32, output_f32=True)
        v = g_a.init(jax.random.PRNGKey(1), z, train=False)
        ya = g_a.apply(v, z, train=False)
        yb = g_b.apply(v, z, train=False)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


# ---------------------------------------------------------------------------
# Metadata-driven legacy-checkpoint decision (round-2 ADVICE)
# ---------------------------------------------------------------------------


class TestLegacyDecisionByMetadata:
    def test_scalar_vs_wide_detection(self, tmp_path):
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        m = CheckpointManager(str(tmp_path / "ck"))
        m.save(1, {"a": jnp.arange(3.0), "n_img": jnp.int32(7)})
        m.save(2, {"a": jnp.arange(3.0),
                   "n_img": jnp.zeros((2,), jnp.int32)})
        m.wait_until_finished()
        assert m._saved_n_img_is_scalar(1) is True
        assert m._saved_n_img_is_scalar(2) is False
        # Unknown step: metadata read fails -> not legacy (normal restore
        # path surfaces its own error).
        assert m._saved_n_img_is_scalar(999) is False
        m.close()
