"""End-to-end test of the generate_samples.py inference CLI: checkpoint a
state, restore via the CLI, write a PNG grid (post-training sampling
capability, /root/reference/demo_mnist.py:210-219 and demo_celeba.py:236-245 —
minus the reference's 28x28-reshape crash bug at CelebA, SURVEY.md §2)."""

import os
import sys

import numpy as np
import pytest
import jax


class TestGenerateSamplesCLI:
    def test_mnist_checkpoint_to_png(self, tmp_path, monkeypatch):
        from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                           CheckpointManager,
                                           create_train_state)

        gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
        hp = BlurredWGANGPHyperParameters()
        state = create_train_state(gan, hp, jax.random.PRNGKey(3), (28, 28, 1))
        mngr = CheckpointManager(str(tmp_path / "checkpoints"))
        mngr.save(256, state)
        mngr.wait_until_finished()
        mngr.close()

        out = tmp_path / "samples.png"
        monkeypatch.setattr(sys, "argv", [
            "generate_samples.py", "--log_dir", str(tmp_path),
            "--dataset", "mnist", "--n", "4", "--out", str(out),
            "--blur_std", "1.5"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import generate_samples

        generate_samples.main()
        assert out.exists() and out.stat().st_size > 0
        from PIL import Image

        img = np.asarray(Image.open(out))
        assert img.shape[0] >= 28 and img.shape[1] >= 28

    def test_interpolation_grid(self, tmp_path, monkeypatch):
        """--interpolate writes an R x S grid walking between latent pairs."""
        from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                           CheckpointManager,
                                           create_train_state)

        gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
        hp = BlurredWGANGPHyperParameters()
        state = create_train_state(gan, hp, jax.random.PRNGKey(3), (28, 28, 1))
        mngr = CheckpointManager(str(tmp_path / "checkpoints"))
        mngr.save(128, state)
        mngr.wait_until_finished()
        mngr.close()

        out = tmp_path / "interp.png"
        monkeypatch.setattr(sys, "argv", [
            "generate_samples.py", "--log_dir", str(tmp_path),
            "--dataset", "mnist", "--interpolate", "--rows", "2",
            "--steps", "5", "--out", str(out)])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import generate_samples

        generate_samples.main()
        from PIL import Image

        img = np.asarray(Image.open(str(out)))
        # 2 rows x 5 cols of 28x28 tiles (any padding only grows it).
        assert img.shape[0] >= 2 * 28 and img.shape[1] >= 5 * 28
        assert img.shape[1] > img.shape[0]  # wider than tall: row-major grid

    def test_infers_model_from_run_manifest(self, tmp_path, monkeypatch):
        """With a run_manifest.json (written by every Trainer), --dataset is
        optional: 1-channel shape → the MNIST family."""
        import json

        from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
        from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                           CheckpointManager,
                                           create_train_state)

        gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
        hp = BlurredWGANGPHyperParameters()
        state = create_train_state(gan, hp, jax.random.PRNGKey(3), (28, 28, 1))
        mngr = CheckpointManager(str(tmp_path / "checkpoints"))
        mngr.save(64, state)
        mngr.wait_until_finished()
        mngr.close()
        with open(tmp_path / "run_manifest.json", "w") as f:
            json.dump({"dataset": "synthetic28x28x1",
                       "image_shape": [28, 28, 1]}, f)

        out = tmp_path / "inferred.png"
        monkeypatch.setattr(sys, "argv", [
            "generate_samples.py", "--log_dir", str(tmp_path),
            "--n", "4", "--out", str(out)])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import generate_samples

        generate_samples.main()
        assert out.exists() and out.stat().st_size > 0

    def test_no_manifest_and_no_dataset_exits(self, tmp_path, monkeypatch):
        monkeypatch.setattr(sys, "argv", [
            "generate_samples.py", "--log_dir", str(tmp_path), "--n", "4"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import generate_samples

        with pytest.raises(SystemExit, match="pre-manifest"):
            generate_samples.main()

    def test_missing_checkpoint_exits_loudly(self, tmp_path, monkeypatch):
        monkeypatch.setattr(sys, "argv", [
            "generate_samples.py", "--log_dir", str(tmp_path),
            "--dataset", "mnist", "--n", "4"])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import generate_samples

        with pytest.raises(SystemExit):
            generate_samples.main()
