"""tools/diagnose_samples.py: the round-4 sample-set diagnosis tool."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "diagnose_samples.py")


def test_spectrum_bands_localise_frequency():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import diagnose_samples as ds

    n, res = 8, 64
    yy = np.arange(res)[None, :, None, None]
    # Horizontal stripes at 16 cycles/image -> energy lands in hi_12-24.
    stripes = np.broadcast_to(
        np.sin(2 * np.pi * 16 * yy / res), (n, res, res, 1)).astype(np.float32)
    bands = ds.spectrum_bands(stripes)
    assert bands["hi_12-24"] > 100 * (
        bands["low_r<4"] + bands["mid_4-12"] + bands["vhi_24+"] + 1e-9)
    # A smooth gradient image concentrates in the lowest band.
    smooth = np.broadcast_to(
        np.linspace(-1, 1, res)[None, :, None, None],
        (n, res, res, 1)).astype(np.float32)
    bands = ds.spectrum_bands(smooth)
    assert bands["low_r<4"] > 10 * bands["hi_12-24"]


def test_pixel_stats_saturation():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import diagnose_samples as ds

    x = np.zeros((4, 8, 8, 1), np.float32)
    x[:2] = 1.0  # half the pixels at the rail
    stats = ds.pixel_stats(x)
    assert stats["sat"] == pytest.approx(0.5)


def test_cli_smoke(tmp_path):
    rng = np.random.RandomState(0)
    np.savez(tmp_path / "ours_samples_s0.npz",
             samples=(rng.rand(1000, 28, 28, 1) * 2 - 1).astype(np.float32))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, TOOL, "--dir", str(tmp_path), "--config", "mnist",
         "--seeds", "0", "--sides", "ours"],
        capture_output=True, text=True, env=env, timeout=600, check=True)
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    assert rows[0]["set"] == "reals" and "sat" in rows[0]
    (row,) = [r for r in rows if r["set"] == "ours_s0"]
    # 28x28 has no energy past r=24 (Nyquist radius ~19.8): the empty band
    # is omitted from the ratios instead of dividing by zero.
    assert set(row["band_ratio_vs_reals"]) == {
        "low_r<4", "mid_4-12", "hi_12-24"}
