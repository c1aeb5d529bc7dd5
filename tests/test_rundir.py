"""Tests for auto-incrementing run directories (utils/rundir.py)."""

import os

from blurred_gan_tpu.utils.rundir import (
    create_result_subdir,
    locate_latest_checkpoint_dir,
)


class TestRunDirs:
    def test_auto_increment(self, tmp_path):
        d1 = create_result_subdir(str(tmp_path), "exp")
        d2 = create_result_subdir(str(tmp_path), "exp")
        assert os.path.basename(d1) == "01-exp"
        assert os.path.basename(d2) == "02-exp"
        assert os.path.isdir(d2)

    def test_names_do_not_collide(self, tmp_path):
        create_result_subdir(str(tmp_path), "a")
        db = create_result_subdir(str(tmp_path), "b")
        assert os.path.basename(db) == "01-b"

    def test_locate_latest_checkpoint(self, tmp_path):
        d1 = create_result_subdir(str(tmp_path), "exp")
        d2 = create_result_subdir(str(tmp_path), "exp")
        os.makedirs(os.path.join(d2, "checkpoints"))
        found = locate_latest_checkpoint_dir(str(tmp_path), "exp")
        assert found == os.path.join(d2, "checkpoints")

    def test_locate_none(self, tmp_path):
        assert locate_latest_checkpoint_dir(str(tmp_path), "missing") is None
