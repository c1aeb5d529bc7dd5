"""bench.py --infer / --infer_export: serving-side sampling throughput.

Contract: one JSON line, a positive images/sec value, and the exported arm
really goes through the StableHLO artifact round-trip (serving.py)."""

import importlib.util
import io
import json
import os
from contextlib import redirect_stdout

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_gan():
    from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
    from blurred_gan_tpu.train import GAN

    return GAN(celeba_generator(8), celeba_discriminator(8), blurred=True)


def _run(bench, gan, use_export):
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.bench_infer(gan, batch=4, resolution=8, steps=2, on_tpu=False,
                          use_export=use_export)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, "driver contract: exactly one JSON line"
    return json.loads(lines[0])


class TestBenchInfer:
    def test_live_path(self, bench, tiny_gan):
        out = _run(bench, tiny_gan, use_export=False)
        assert out["metric"] == "infer_images_per_sec_celeba8"
        assert out["value"] > 0
        assert out["unit"] == "images/sec/chip"
        assert out["vs_baseline"] is None  # reference has no serving bench
        assert out["batch"] == 4
        assert out["exported"] is False

    def test_exported_artifact_path(self, bench, tiny_gan):
        out = _run(bench, tiny_gan, use_export=True)
        assert out["metric"] == "infer_images_per_sec_celeba8_exported"
        assert out["value"] > 0
        assert out["exported"] is True
