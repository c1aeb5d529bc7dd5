"""Tests for the host data pipelines."""

import numpy as np
import pytest

from blurred_gan_tpu.data import (
    ArrayDataset,
    DataPipeline,
    load_celeba,
    load_mnist,
    synthetic_dataset,
)


class TestArrayDataset:
    def test_shapes_and_dtype(self):
        ds = synthetic_dataset((28, 28, 1), num_examples=64)
        assert ds.num_examples == 64
        assert ds.image_shape == (28, 28, 1)
        b = next(iter(ds.batches(16)))
        assert b.shape == (16, 28, 28, 1) and b.dtype == np.uint8

    def test_epoch_shuffling_deterministic(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=32, seed=1)
        a = [b.copy() for _, b in zip(range(4), ds.batches(8, seed=5))]
        b = [b.copy() for _, b in zip(range(4), ds.batches(8, seed=5))]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_different_epochs_different_order(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=64, seed=1)
        it = ds.batches(64, seed=5)
        e0, e1 = next(it), next(it)
        assert not np.array_equal(e0, e1)
        # same multiset of images
        np.testing.assert_array_equal(
            np.sort(e0.reshape(64, -1), axis=0),
            np.sort(e1.reshape(64, -1), axis=0))

    def test_start_epoch_resume(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=32, seed=1)
        it_full = ds.batches(16, seed=9)
        for _ in range(2):
            next(it_full)  # consume epoch 0
        third = next(it_full)
        resumed = next(ds.batches(16, seed=9, start_epoch=1))
        np.testing.assert_array_equal(third, resumed)

    def test_synthetic_has_structure(self):
        # Not white noise: neighbouring pixels correlate strongly.
        ds = synthetic_dataset((32, 32, 1), num_examples=8)
        x = ds.images.astype(np.float32)
        corr = np.corrcoef(x[:, :-1, :, 0].ravel(), x[:, 1:, :, 0].ravel())[0, 1]
        assert corr > 0.9


class TestLoaders:
    def test_mnist_fallback_shape(self):
        ds = load_mnist(path="/nonexistent/mnist.npz")
        assert ds.image_shape == (28, 28, 1)
        assert ds.num_examples == 60_000

    def test_mnist_no_fallback_raises(self):
        with pytest.raises(FileNotFoundError):
            load_mnist(path="/nonexistent/mnist.npz",
                       allow_synthetic_fallback=False)

    def test_mnist_npz_roundtrip(self, tmp_path):
        x = np.random.RandomState(0).randint(0, 255, (100, 28, 28), np.uint8)
        np.savez(tmp_path / "mnist.npz", x_train=x, x_test=x[:10])
        ds = load_mnist(path=str(tmp_path / "mnist.npz"))
        assert ds.num_examples == 100
        np.testing.assert_array_equal(ds.images[..., 0], x)

    def test_celeba_fallback(self):
        ds = load_celeba(path="/nonexistent", resolution=64, num_examples=128)
        assert ds.image_shape == (64, 64, 3)

    def test_image_folder(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(0)
        for i in range(6):
            Image.fromarray(
                rng.randint(0, 255, (72, 60, 3), np.uint8)).save(
                tmp_path / f"img{i}.jpg")
        ds = load_celeba(path=str(tmp_path), resolution=32)
        assert ds.num_examples == 6
        assert ds.image_shape == (32, 32, 3)
        b = next(iter(ds.batches(2, seed=0)))
        assert b.shape == (2, 32, 32, 3) and b.dtype == np.uint8

    def test_image_folder_materialize(self, tmp_path):
        """materialize() decodes the folder once into an ArrayDataset whose
        images match per-batch decode in file order (the bridge to
        device-resident chunked training on real data)."""
        from PIL import Image

        rng = np.random.RandomState(1)
        for i in range(7):
            Image.fromarray(
                rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
                tmp_path / f"img{i}.png")
        folder = load_celeba(path=str(tmp_path), resolution=24)
        arr = folder.materialize(decode_batch=3, progress=False)
        assert hasattr(arr, "images")
        assert arr.images.shape == (7, 24, 24, 3)
        assert arr.images.dtype == np.uint8
        assert arr.name.endswith(":materialized")
        direct = folder._decode_batch(folder.files)
        np.testing.assert_array_equal(arr.images, direct)


class TestPipeline:
    def test_prefetch_yields_same_stream(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=64, seed=3)
        direct = [b.copy() for _, b in zip(range(6), ds.batches(16, seed=7))]
        pipe = DataPipeline(ds, 16, seed=7)
        fetched = [b for _, b in zip(range(6), iter(pipe))]
        pipe.close()
        for x, y in zip(direct, fetched):
            np.testing.assert_array_equal(x, y)

    def test_steps_per_epoch(self):
        ds = synthetic_dataset((8, 8, 1), num_examples=100)
        assert DataPipeline(ds, 32).steps_per_epoch == 3
