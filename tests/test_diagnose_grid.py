"""Grid-PNG fallback of tools/diagnose_samples.py (round-5).

The round-4 reference heavy-blur sample npz sets died with /tmp; only their
8x8 grid PNGs are tracked (results/quality/heavy64/grids/). Those grids were
rendered straight from [-1, 1] samples through samples_grid's clip(x, 0, 1)
(utils/images.py:41-50), so recovery is lossy. These tests pin (a) exact
tile recovery up to uint8 quantization, and (b) that the *qualitative*
spectrum-band signature — which band carries a generator's excess energy —
survives the clip + quantization roundtrip, which is what the BASELINE.md
heavy-regime diagnosis relies on for the reference side.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def ds():
    import diagnose_samples

    return diagnose_samples


def _roundtrip(samples: np.ndarray, tmp_path, ds) -> np.ndarray:
    """Render [-1,1] samples the way round-4 grids were written, reload."""
    from blurred_gan_tpu.utils.images import save_image_grid

    path = os.path.join(tmp_path, "g.png")
    save_image_grid(samples, path)
    return ds.load_grid_samples(path, samples.shape[1])


def test_tile_recovery_quantization_exact(tmp_path, ds):
    rng = np.random.RandomState(0)
    x = (rng.rand(64, 64, 64, 3) * 2 - 1).astype(np.float32)
    rec = _roundtrip(x, tmp_path, ds)
    assert rec.shape == (64, 64, 64, 3)
    # Recovery equals clip(x, 0, 1) up to the uint8 half-step.
    assert np.abs(rec - ds.to_clip_domain(x)).max() <= (0.5 / 255) + 1e-6


def test_band_signature_survives_clip_roundtrip(tmp_path, ds):
    """Dominant excess band identical for true samples vs grid recovery."""
    rng = np.random.RandomState(1)
    res = 64
    base = np.tanh(3 * rng.rand(64, res, res, 3) @
                   np.full((3, 3), 1 / 3, np.float32))  # smooth-ish base
    yy = np.arange(res, dtype=np.float32)[None, :, None, None]

    # "ours"-like: mid-frequency horizontal stripes (hi_12-24 band).
    stripes = np.clip(base + 0.4 * np.sin(2 * np.pi * 16 * yy / res),
                      -1, 1).astype(np.float32)
    # "ref"-like: pixel-scale dither (vhi_24+ band).
    dither = np.clip(base + 0.4 * np.sign(rng.rand(64, res, res, 3) - 0.5),
                     -1, 1).astype(np.float32)

    reals = np.clip(base, -1, 1).astype(np.float32)
    for fakes, want in ((stripes, "hi_12-24"), (dither, "vhi_24+")):
        truth = ds.spectrum_bands(fakes)
        reals_b = ds.spectrum_bands(reals)
        truth_ratio = {k: truth[k] / reals_b[k] for k in truth
                       if reals_b[k] > 0}
        assert max(truth_ratio, key=truth_ratio.get) == want
        # Same computation in the paired clip domain on grid-recovered tiles.
        rec = _roundtrip(fakes, tmp_path, ds)
        rec_bands = ds.spectrum_bands(rec)
        reals_clip = ds.spectrum_bands(ds.to_clip_domain(reals))
        rec_ratio = {k: rec_bands[k] / reals_clip[k] for k in rec_bands
                     if reals_clip[k] > 0}
        assert max(rec_ratio, key=rec_ratio.get) == want


def test_cli_grid_fallback(tmp_path, ds):
    """--grids_from scores an npz-less side from its grid PNG, clip-domain."""
    import json
    import subprocess

    from blurred_gan_tpu.utils.images import save_image_grid

    rng = np.random.RandomState(2)
    x = (rng.rand(80, 28, 28, 1) * 2 - 1).astype(np.float32)
    np.savez(tmp_path / "ours_samples_s0.npz", samples=x)
    grids = tmp_path / "grids"
    grids.mkdir()
    save_image_grid((rng.rand(64, 28, 28, 1) * 2 - 1).astype(np.float32),
                    str(grids / "g_ref_s0.png"))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "diagnose_samples.py"),
         "--dir", str(tmp_path), "--config", "mnist", "--seeds", "0",
         "--sides", "ref,ours", "--grids_from", str(grids)],
        capture_output=True, text=True, env=env, timeout=600, check=True)
    rows = {r["set"]: r for r in
            (json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{"))}
    assert rows["reals"]["domain"] == "clip01" and rows["reals"]["n"] == 64
    assert rows["ref_s0"]["source"] == "grid_png"
    assert rows["ours_s0"]["source"] == "npz" and rows["ours_s0"]["n"] == 64
    # Clip-domain rows report both rails.
    assert "rail0" in rows["ref_s0"] and "rail1" in rows["ours_s0"]
