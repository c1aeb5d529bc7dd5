"""tools/score.py — the standalone SWD/FID scoring CLI."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def score_mod():
    spec = importlib.util.spec_from_file_location(
        "score_cli", os.path.join(os.path.dirname(__file__), "..",
                                  "tools", "score.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sample_sets(tmp_path_factory):
    d = tmp_path_factory.mktemp("score")
    rs = np.random.RandomState(0)
    a = rs.randint(0, 256, (48, 32, 32, 3), np.uint8)
    b = np.clip(a.astype(np.int16)
                + rs.randint(-40, 40, a.shape), 0, 255).astype(np.uint8)
    pa, pb = str(d / "a.npz"), str(d / "b.npz")
    np.savez(pa, samples=a)
    np.savez(pb, samples=b)
    return pa, pb


def run_cli(score_mod, monkeypatch, capsys, *argv):
    monkeypatch.setattr(sys, "argv", ["score.py", *argv])
    score_mod.main()
    return json.loads(capsys.readouterr().out.strip())


class TestLoad:
    def test_npz_uint8_to_unit_range(self, score_mod, sample_sets):
        x = score_mod._load(sample_sets[0], None, None)
        assert x.dtype == np.float32 and x.min() >= -1.0 and x.max() <= 1.0

    def test_limit(self, score_mod, sample_sets):
        assert len(score_mod._load(sample_sets[0], None, 7)) == 7

    def test_grayscale_npy_gains_channel(self, score_mod, tmp_path):
        p = str(tmp_path / "g.npy")
        np.save(p, np.zeros((4, 16, 16), np.uint8))
        assert score_mod._load(p, None, None).shape == (4, 16, 16, 1)


class TestScoring:
    def test_identical_sets_fid_zero(self, score_mod, sample_sets,
                                     monkeypatch, capsys):
        out = run_cli(score_mod, monkeypatch, capsys,
                      "--real", sample_sets[0], "--fake", sample_sets[0],
                      "--no_swd", "--batch", "16")
        assert abs(out["fid_randconv"]) < 1e-3
        assert out["n_images"] == 48

    def test_swd_and_fid_keys(self, score_mod, sample_sets, monkeypatch,
                              capsys):
        out = run_cli(score_mod, monkeypatch, capsys,
                      "--real", sample_sets[0], "--fake", sample_sets[1],
                      "--batch", "16")
        assert "SWDx1e3_32" in out and "SWDx1e3_16" in out
        assert "SWDx1e3_avg" in out and out["fid_randconv"] > 0

    def test_shape_mismatch_rejected(self, score_mod, sample_sets, tmp_path,
                                     monkeypatch, capsys):
        p = str(tmp_path / "small.npz")
        np.savez(p, samples=np.zeros((4, 16, 16, 3), np.uint8))
        with pytest.raises(SystemExit, match="shape mismatch"):
            run_cli(score_mod, monkeypatch, capsys,
                    "--real", sample_sets[0], "--fake", p)

    def test_directory_input(self, score_mod, tmp_path, monkeypatch, capsys):
        from PIL import Image

        rs = np.random.RandomState(1)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(12):
            Image.fromarray(rs.randint(0, 256, (40, 36, 3), np.uint8)).save(
                str(d / f"{i:02d}.png"))
        out = run_cli(score_mod, monkeypatch, capsys,
                      "--real", str(d), "--fake", str(d),
                      "--resolution", "32", "--no_swd", "--batch", "8")
        assert out["image_shape"] == [32, 32, 3]
        assert abs(out["fid_randconv"]) < 1e-3
