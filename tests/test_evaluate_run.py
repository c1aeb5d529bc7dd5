"""tools/evaluate_run.py — post-hoc checkpoint evaluation CLI."""

import json
import os
import sys

import numpy as np
import pytest
import jax


def _checkpointed_run(tmp_path):
    from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       CheckpointManager, create_train_state)

    gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
    hp = BlurredWGANGPHyperParameters()
    state = create_train_state(gan, hp, jax.random.PRNGKey(3), (28, 28, 1))
    mngr = CheckpointManager(str(tmp_path / "checkpoints"))
    mngr.save(320, state)
    mngr.wait_until_finished()
    mngr.close()


class TestEvaluateRunCLI:
    def test_scores_restored_checkpoint(self, tmp_path, monkeypatch, capsys):
        _checkpointed_run(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path),
            "--dataset", "mnist", "--num_samples", "64"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run", os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["examples_seen"] == 320
        assert np.isfinite(out["FID"]) and out["FID"] > 0
        assert any(k.startswith("SWD") for k in out)

    def test_infers_model_from_run_manifest(self, tmp_path, monkeypatch,
                                            capsys):
        """With a run_manifest.json (written by every Trainer), --dataset /
        --resolution are optional: 1-channel shape → the MNIST family."""
        _checkpointed_run(tmp_path)
        with open(tmp_path / "run_manifest.json", "w") as f:
            json.dump({"dataset": "synthetic28x28x1",
                       "image_shape": [28, 28, 1]}, f)
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path),
            "--num_samples", "64"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run3", os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["examples_seen"] == 320

    def test_readonly_cli_never_clobbers_the_manifest(self, tmp_path,
                                                      monkeypatch):
        """evaluate_run constructs a Trainer; the manifest is written by the
        fit entry points only, so a read-only (even wrongly-flagged) eval
        must leave the training run's manifest byte-identical."""
        _checkpointed_run(tmp_path)
        original = json.dumps({"dataset": "synthetic28x28x1",
                               "image_shape": [28, 28, 1]})
        with open(tmp_path / "run_manifest.json", "w") as f:
            f.write(original)
        # Wrong flags: the restore fails with the friendly hint, and the
        # manifest must NOT have been rewritten as a celeba@64 one.
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path),
            "--dataset", "celeba", "--resolution", "64",
            "--num_samples", "32"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run_clobber",
            os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        with pytest.raises(SystemExit):
            mod.main()
        assert (tmp_path / "run_manifest.json").read_text() == original

    def test_model_mismatch_is_a_clear_error(self, tmp_path, monkeypatch):
        """A celeba model against an MNIST checkpoint must exit with the
        dataset/resolution hint, not a raw Orbax traceback."""
        _checkpointed_run(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path),
            "--dataset", "celeba", "--resolution", "64",
            "--num_samples", "32"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run4", os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        with pytest.raises(SystemExit, match="dataset/--resolution"):
            mod.main()

    def test_no_manifest_and_no_dataset_exits(self, tmp_path, monkeypatch):
        _checkpointed_run(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path)])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run5", os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        with pytest.raises(SystemExit, match="pre-manifest"):
            mod.main()

    def test_no_checkpoint_exits(self, tmp_path, monkeypatch):
        monkeypatch.setattr(sys, "argv", [
            "evaluate_run.py", "--log_dir", str(tmp_path / "empty"),
            "--dataset", "mnist", "--num_samples", "32"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evaluate_run2", os.path.join(repo, "tools", "evaluate_run.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        with pytest.raises(SystemExit, match="no checkpoint"):
            mod.main()
