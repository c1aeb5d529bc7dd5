"""Device-hang watchdog (utils/watchdog.py + TrainerConfig plumbing).

Failure *detection* beyond the reference's save-on-Ctrl-C
(/root/reference/demo_mnist.py:207-208): a wedged device/transport turns the
per-step metric fetch into an unbounded hang; the watchdog bounds it and
raises DeviceHangError so supervisors can restart + checkpoint-resume.
"""

import time

import numpy as np
import pytest
import jax.numpy as jnp

from blurred_gan_tpu.utils import watchdog
from blurred_gan_tpu.utils.watchdog import DeviceHangError, fetch

from test_train_loop import make_trainer


class TestFetch:
    def test_disabled_is_direct(self):
        x = jnp.arange(6.0).reshape(2, 3)
        out = fetch(x, None)
        np.testing.assert_array_equal(out, np.arange(6.0).reshape(2, 3))
        assert isinstance(out, np.ndarray)
        out0 = fetch(x, 0)
        np.testing.assert_array_equal(out0, out)

    def test_watchdogged_fetch_returns_value(self):
        x = jnp.ones((4,)) * 3.0
        out = fetch(x, 30.0, what="test fetch")
        np.testing.assert_array_equal(out, np.full((4,), 3.0))

    def test_block_until_ready_mode(self):
        tree = {"a": jnp.ones((2, 2)), "b": jnp.zeros((3,))}
        out = fetch(tree, 30.0, to_numpy=False)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.ones((2, 2)))

    def test_hang_raises_with_label(self, monkeypatch):
        def slow(x, to_numpy):
            time.sleep(10.0)
            return np.asarray(x)

        monkeypatch.setattr(watchdog, "_materialize", slow)
        t0 = time.perf_counter()
        with pytest.raises(DeviceHangError, match="step metrics"):
            fetch(jnp.ones(()), 0.3, what="step metrics")
        # Raised at the deadline, not after the (10 s) hang finished.
        assert time.perf_counter() - t0 < 5.0

    def test_worker_exception_propagates(self, monkeypatch):
        def boom(x, to_numpy):
            raise ValueError("inner failure")

        monkeypatch.setattr(watchdog, "_materialize", boom)
        with pytest.raises(ValueError, match="inner failure"):
            fetch(jnp.ones(()), 5.0)


class TestTrainerIntegration:
    def test_enabled_watchdog_run_completes(self, tmp_path):
        """No false positives: a healthy short run under a generous deadline
        finishes exactly like an unwatched one."""
        tr = make_trainer(tmp_path)
        tr.cfg.device_fetch_timeout_s = 300.0
        state = tr.fit(total_examples=10_000, max_steps=4)
        assert int(state.n_batches) == 4
        assert np.isfinite(tr._last_metrics["disc_loss"])
        tr.close()

    def test_wedged_fetch_detected(self, tmp_path, monkeypatch):
        """A hang on the per-step fetch surfaces as DeviceHangError instead
        of blocking fit() forever."""
        tr = make_trainer(tmp_path, subdir="wedged")
        tr.cfg.device_fetch_timeout_s = 0.2
        tr.cfg.first_device_fetch_timeout_s = 0.2

        real = watchdog._materialize

        def wedged(x, to_numpy):
            time.sleep(30.0)
            return real(x, to_numpy)

        monkeypatch.setattr(watchdog, "_materialize", wedged)
        t0 = time.perf_counter()
        with pytest.raises(DeviceHangError):
            tr.fit(total_examples=10_000, max_steps=4)
        assert time.perf_counter() - t0 < 20.0

    def test_first_fetch_gets_compile_budget(self, tmp_path, monkeypatch):
        """The first fetch of a fit call (which synchronises on the step
        compile) is budgeted by first_device_fetch_timeout_s, so a small
        steady-state deadline does not false-positive on compile time."""
        tr = make_trainer(tmp_path, subdir="budget")
        tr.cfg.device_fetch_timeout_s = 0.001
        tr.cfg.first_device_fetch_timeout_s = 300.0

        seen = []
        real_fetch = watchdog.fetch

        def spy(x, timeout_s=None, **kw):
            seen.append(timeout_s)
            return real_fetch(x, 300.0, **kw)

        import blurred_gan_tpu.train.loop as loop_mod

        monkeypatch.setattr(loop_mod, "watchdog_fetch", spy)
        tr.fit(total_examples=10_000, max_steps=2)
        assert seen[0] == 300.0          # compile-inclusive budget
        assert seen[1] == pytest.approx(0.001)  # steady-state deadline
        tr.close()

    def test_chunked_budget_scales_with_chunk_steps(self, tmp_path,
                                                    monkeypatch):
        """The knob is a PER-STEP budget: device-resident fetches await a
        whole scanned chunk, so their deadline is budget x chunk_steps."""
        tr = make_trainer(tmp_path, subdir="chunked_budget")
        tr.cfg.device_fetch_timeout_s = 2.0
        tr.cfg.first_device_fetch_timeout_s = 500.0

        seen = []
        real_fetch = watchdog.fetch

        def spy(x, timeout_s=None, **kw):
            seen.append(timeout_s)
            return real_fetch(x, 500.0, **kw)

        import blurred_gan_tpu.train.loop as loop_mod

        monkeypatch.setattr(loop_mod, "watchdog_fetch", spy)
        tr.fit_device_resident(total_examples=10_000, chunk_steps=5,
                               max_chunks=2)
        assert seen[0] == 500.0               # first: compile budget
        assert seen[1] == pytest.approx(10.0)  # 2.0 s/step x 5 steps
        tr.close()
