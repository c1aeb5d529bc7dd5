"""Tests for the JSONL/TensorBoard metrics logger."""

import json
import os

import numpy as np

from blurred_gan_tpu.utils.logging import MetricsLogger


class TestMetricsLogger:
    def test_jsonl_scalars(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
        lg.scalars(10, {"a": 1.5, "b": np.float32(2.0), "bad": "skip"})
        lg.hparams({"lr": 1e-3, "opt": "adam"})
        lg.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "events.jsonl").read().splitlines()]
        assert lines[0]["step"] == 10 and lines[0]["a"] == 1.5
        assert "bad" not in lines[0]
        assert lines[1]["hparams"]["opt"] == "adam"

    def test_tensorboard_files(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), use_tensorboard=True)
        lg.scalars(1, {"x": 1.0})
        lg.image(1, "img", np.zeros((8, 8, 3), np.uint8))
        lg.close()
        assert any(f.startswith("events.out.tfevents")
                   for f in os.listdir(tmp_path))
