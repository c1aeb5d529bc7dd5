"""Round-2 hardening tests: wide counters, disabled hooks, loud pipeline
misconfiguration, deferred interrupt saves, CLI flag wiring, and the Pallas
VMEM fallback gate (VERDICT.md round-1 items 6-9 + ADVICE.md findings)."""

import os
import signal
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.data.pipeline import ArrayDataset, DataPipeline
from blurred_gan_tpu.train import wide_add, wide_counter, wide_value
from blurred_gan_tpu.train.checkpoint import save_on_interrupt
from blurred_gan_tpu.train.hooks import EveryNExamples


class TestWideCounter:
    """n_img must stay exact past 2**31 images (int32 would wrap at ~54 h of
    flagship-rate training, VERDICT.md weak #8)."""

    def test_roundtrip(self):
        for v in (0, 1, 2**30 - 1, 2**30, 2**31 - 8, 2**31 + 8, 2**40 + 123):
            assert wide_value(wide_counter(v)) == v

    def test_add_crosses_int32_boundary_on_device(self):
        add = jax.jit(wide_add)
        c = wide_counter(2**31 - 8)
        for _ in range(4):  # +64 crosses 2**31
            c = add(c, 16)
        assert wide_value(c) == 2**31 + 56
        assert c.dtype == jnp.int32

    def test_many_small_batches_exact(self):
        add = jax.jit(wide_add)
        c = wide_counter(2**30 - 5)
        total = 2**30 - 5
        for k in (1, 3, 7, 1023, 2**29):
            c = add(c, k)
            total += k
        assert wide_value(c) == total


class TestDisabledHooks:
    def test_zero_period_never_fires_no_zerodivision(self):
        fired = []
        h = EveryNExamples(0, lambda n, logs: fired.append(n))
        for _ in range(5):
            assert h.after_step(32, {}) is False
        assert fired == []

    def test_negative_period_disabled(self):
        h = EveryNExamples(-10, lambda n, logs: None)
        assert h.after_step(32, {}) is False

    def test_zero_period_restore_safe(self):
        h = EveryNExamples(0, lambda n, logs: None)
        h.restore(12345)  # must not divide by zero
        assert h.after_step(32, {}) is False


class TestPipelineMisconfigLoud:
    """batch_size > shard size must raise, not hang the prefetch consumer
    (ADVICE.md pipeline.py:79)."""

    def test_batch_larger_than_dataset_raises(self):
        ds = ArrayDataset(np.zeros((4, 8, 8, 1), np.uint8))
        with pytest.raises(ValueError, match="exceeds this shard"):
            next(ds.batches(8))

    def test_batch_larger_than_shard_raises(self):
        ds = ArrayDataset(np.zeros((8, 8, 8, 1), np.uint8))
        with pytest.raises(ValueError, match="shard_count=4"):
            next(ds.batches(4, shard_index=0, shard_count=4))

    def test_error_propagates_through_prefetch_thread(self):
        ds = ArrayDataset(np.zeros((4, 8, 8, 1), np.uint8))
        pipe = DataPipeline(ds, batch_size=8)
        with pytest.raises(ValueError, match="exceeds this shard"):
            next(iter(pipe))
        pipe.close()

    def test_valid_config_still_streams(self):
        ds = ArrayDataset(np.zeros((8, 8, 8, 1), np.uint8))
        it = ds.batches(2, shard_index=1, shard_count=2)
        assert next(it).shape == (2, 8, 8, 1)


class TestDeferredInterruptSave:
    """The donation race (ADVICE.md loop.py:363): with defer=True the handler
    must NOT save from inside the signal context; the save happens at the
    caller's check() point and still exactly once."""

    def test_deferred_signal_saves_at_checkpoint_only(self):
        saves = []
        with pytest.raises(KeyboardInterrupt):
            with save_on_interrupt(lambda: saves.append(1),
                                   defer=True) as check:
                os.kill(os.getpid(), signal.SIGINT)
                assert saves == []  # handler only recorded the signal
                check()
                raise AssertionError("check() must raise KeyboardInterrupt")
        assert saves == [1]

    def test_second_signal_escalates(self):
        saves = []
        with pytest.raises(KeyboardInterrupt):
            with save_on_interrupt(lambda: saves.append(1), defer=True):
                os.kill(os.getpid(), signal.SIGINT)
                os.kill(os.getpid(), signal.SIGINT)  # escape hatch
        assert saves == [1]

    def test_failing_save_still_unwinds(self):
        def bad_save():
            raise RuntimeError("orbax exploded")

        with pytest.raises(KeyboardInterrupt):
            with save_on_interrupt(bad_save, defer=True) as check:
                os.kill(os.getpid(), signal.SIGINT)
                check()

    def test_immediate_mode_unchanged(self):
        saves = []
        with pytest.raises(KeyboardInterrupt):
            with save_on_interrupt(lambda: saves.append(1)):
                os.kill(os.getpid(), signal.SIGINT)
        assert saves == [1]


class TestImageSummariesFlagWired:
    """--save_image_summaries_interval must reach the Trainer (VERDICT.md
    weak #4: it used to be parsed, saved to sidecars, and ignored)."""

    def test_train_mnist_wires_interval(self, monkeypatch, tmp_path):
        import train_mnist

        captured = {}

        class FakeTrainer:
            def __init__(self, *a, **kw):
                captured.update(kw)

            def fit(self, **kw):
                pass

            def close(self):
                pass

        monkeypatch.setattr(train_mnist, "Trainer", FakeTrainer)
        monkeypatch.setattr(
            train_mnist, "load_mnist",
            lambda path=None: synthetic_dataset((28, 28, 1), num_examples=64))
        monkeypatch.setattr(sys, "argv", [
            "train_mnist.py", "--save_image_summaries_interval", "7",
            "--log_dir", str(tmp_path), "--epochs", "1"])
        train_mnist.main()
        assert captured["trainer_config"].image_summaries_interval_batches == 7


class TestPallasVmemGate:
    def test_budget_decision(self):
        from blurred_gan_tpu.ops.blur_pallas import (_VMEM_BUDGET_BYTES,
                                                     _kernel_vmem_bytes)

        assert _kernel_vmem_bytes(128, 128) < _VMEM_BUDGET_BYTES
        assert _kernel_vmem_bytes(256, 256) < _VMEM_BUDGET_BYTES
        assert _kernel_vmem_bytes(512, 512) < _VMEM_BUDGET_BYTES  # ~7 MB
        assert _kernel_vmem_bytes(1024, 1024) > _VMEM_BUDGET_BYTES  # ~28 MB

    def test_512_matches_reference_path(self):
        # On CPU both lower to einsum; the point is the primitive accepts the
        # shape and stays numerically identical to the jnp reference blur.
        from blurred_gan_tpu.ops.blur import blur_images
        from blurred_gan_tpu.ops.blur_pallas import blur_images_pallas

        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 512, 512, 1),
                               jnp.float32, -1, 1)
        sigma = jnp.float32(8.0)
        a = blur_images(x, sigma)
        b = blur_images_pallas(x, sigma)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


class TestLegacyCheckpointMigration:
    def test_scalar_n_img_checkpoint_restores_into_wide_template(self, tmp_path):
        """Pre-0.3 checkpoints stored n_img as a scalar int32; restoring into
        the wide-counter template must migrate instead of crashing."""
        from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                           create_train_state)
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=2)
        gan = GAN(DCGANGenerator(latent_size=8, init_hw=(4, 4),
                                 init_features=8, blocks=((8, 2),),
                                 out_channels=1, final_transpose=False,
                                 final_stride=1),
                  DCGANDiscriminator(channels=(8,)), latent_size=8,
                  blurred=True)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (8, 8, 1))
        legacy = state.replace(n_img=jnp.int32(12345),
                               n_batches=jnp.int32(77))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(12345, legacy)
        mngr.wait_until_finished()

        restored, aux, step = mngr.restore_latest(state)  # wide template
        assert step == 12345
        assert restored.n_img.shape == (2,)
        assert wide_value(restored.n_img) == 12345
        assert int(restored.n_batches) == 77
        mngr.close()

    def test_wide_checkpoint_still_restores_directly(self, tmp_path):
        from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                           create_train_state)
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=2)
        gan = GAN(DCGANGenerator(latent_size=8, init_hw=(4, 4),
                                 init_features=8, blocks=((8, 2),),
                                 out_channels=1, final_transpose=False,
                                 final_stride=1),
                  DCGANDiscriminator(channels=(8,)), latent_size=8,
                  blurred=True)
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (8, 8, 1))
        wide = state.replace(n_img=wide_counter(2**31 + 5))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(7, wide)
        mngr.wait_until_finished()
        restored, _, _ = mngr.restore_latest(state)
        assert wide_value(restored.n_img) == 2**31 + 5
        mngr.close()
