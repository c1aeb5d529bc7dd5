"""bench.py device preflight: the driver-facing contract is ONE JSON line
even when the attached device is wedged (observed relay failure mode:
backend init / dispatch blocking indefinitely)."""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestEmitUnreachable:
    def test_single_json_line_with_null_value(self, bench):
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench._emit_unreachable("device unresponsive: test", 128)
        lines = [l for l in buf.getvalue().splitlines() if l.strip()]
        assert len(lines) == 1
        out = json.loads(lines[0])
        assert out["value"] is None
        assert out["vs_baseline"] is None
        assert out["unit"] == "images/sec/chip"
        assert "unresponsive" in out["error"]
        assert out["metric"] == "train_images_per_sec_celeba128_wgangp_blur"


class TestProbeOnce:
    def test_healthy_backend_returns_value(self, bench):
        # 128x128 ones: (A @ A).sum() = 128^3
        val = bench._probe_once(60.0, 1.0)
        assert val == pytest.approx(128.0 ** 3)

    def test_hang_returns_none_not_exception(self, bench, monkeypatch):
        """A worker that never completes (stubbed Thread) -> join times out
        -> None, the 'hung' signal — no exception, no block."""
        import threading

        class StubThread:
            def __init__(self, target=None, daemon=None, name=None):
                pass

            def start(self):
                pass

            def join(self, timeout=None):
                pass  # result list stays empty, as in a real hang

        monkeypatch.setattr(threading, "Thread", StubThread)
        assert bench._probe_once(0.05, 2.0) is None


class TestPreflight:
    def test_healthy_device_passes(self, bench):
        assert bench._device_preflight(128) is True

    def test_exhausted_budget_emits_json(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("BENCH_PREFLIGHT_BUDGET_S", "0")
        monkeypatch.setenv("BENCH_PREFLIGHT_PROBE_S", "1")
        monkeypatch.setattr(bench, "_probe_once", lambda t, s: None)
        assert bench._device_preflight(128) is False
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        payload = json.loads(out[0])
        assert payload["value"] is None and "unresponsive" in payload["error"]

    def test_recovery_mid_budget(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("BENCH_PREFLIGHT_BUDGET_S", "30")
        monkeypatch.setenv("BENCH_PREFLIGHT_PROBE_S", "1")
        calls = {"n": 0}

        def flaky(timeout_s, salt):
            calls["n"] += 1
            return None if calls["n"] < 2 else 1.0

        monkeypatch.setattr(bench, "_probe_once", flaky)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        assert bench._device_preflight(128) is True
        assert calls["n"] == 2
        assert capsys.readouterr().out.strip() == ""  # stdout stays clean

    def test_chunked_wedge_emits_json(self, bench, monkeypatch, capsys):
        """A relay wedge during --chunked's packed-metric fetch must produce
        the honest null JSON (one line), not hang the driver — the same
        contract the scanned path's watchdog fetch already enforces."""
        import blurred_gan_tpu.utils.watchdog as wd
        from blurred_gan_tpu.models import (DCGANDiscriminator,
                                            DCGANGenerator)
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN)

        def wedge(x, timeout_s=None, **kw):
            raise wd.DeviceHangError("test wedge")

        # bench_chunked imports `fetch` from the watchdog module at call
        # time, so patching the module attribute intercepts it.
        monkeypatch.setattr(wd, "fetch", wedge)
        g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                           blocks=((32, 2), (16, 2)), out_channels=3,
                           final_transpose=False, final_stride=1)
        d = DCGANDiscriminator(channels=(16, 32))
        gan = GAN(g, d, latent_size=16, blurred=True)
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=4)
        bench.bench_chunked(gan, hp, batch=4, resolution=16, steps=2,
                            on_tpu=False)
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        payload = json.loads(out[0])
        assert payload["value"] is None
        assert "wedged mid-bench (chunked)" in payload["error"]

    def test_terminal_error_emits_json(self, bench, monkeypatch, capsys):
        def boom(timeout_s, salt):
            raise RuntimeError("pjrt init failed")

        monkeypatch.setattr(bench, "_probe_once", boom)
        assert bench._device_preflight(64) is False
        payload = json.loads(capsys.readouterr().out.strip())
        assert payload["value"] is None
        assert "pjrt init failed" in payload["error"]
        assert payload["metric"].endswith("celeba64_wgangp_blur")
