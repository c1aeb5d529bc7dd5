"""ShardedArrayDataset / write_shards: the decode-once mmap shard store.

Core contract: the shard store's batch stream is bit-identical to an
ArrayDataset over the concatenated array — resume, multi-host sharding and
prefetch semantics carry over unchanged (data/pipeline.py)."""

import importlib.util
import itertools
import os
import sys

import numpy as np
import pytest

from blurred_gan_tpu.data.pipeline import (ArrayDataset, DataPipeline,
                                           ImageFolderDataset,
                                           ShardedArrayDataset, load_celeba,
                                           synthetic_dataset, write_shards)


@pytest.fixture(scope="module")
def corpus():
    return synthetic_dataset((12, 12, 3), num_examples=100, seed=3)


@pytest.fixture()
def store(corpus, tmp_path):
    # shard_size 32 over 100 examples: three full shards + a 4-example tail.
    return write_shards(corpus, str(tmp_path / "shards"), shard_size=32,
                        progress=False)


class TestWriteShards:
    def test_layout_and_identity(self, corpus, store, tmp_path):
        names = sorted(p.name for p in (tmp_path / "shards").iterdir())
        assert names == [f"shard-{k:05d}.npy" for k in range(4)]
        assert store.num_examples == 100
        assert store.image_shape == (12, 12, 3)
        np.testing.assert_array_equal(store._gather(np.arange(100)),
                                      corpus.images)

    def test_refuses_nonempty_dir(self, corpus, store, tmp_path):
        with pytest.raises(FileExistsError):
            write_shards(corpus, str(tmp_path / "shards"), shard_size=32)

    def test_from_raw_array(self, tmp_path):
        x = np.arange(5 * 4 * 4 * 1, dtype=np.uint8).reshape(5, 4, 4, 1)
        ds = write_shards(x, str(tmp_path / "raw"), shard_size=2,
                          progress=False)
        np.testing.assert_array_equal(ds._gather(np.arange(5)), x)

    def test_from_image_folder(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(0)
        folder = tmp_path / "imgs"
        folder.mkdir()
        for i in range(6):
            Image.fromarray(rng.randint(0, 255, (40, 30, 3), np.uint8)).save(
                folder / f"img{i}.png")
        src = ImageFolderDataset(str(folder), resolution=16)
        ds = write_shards(src, str(tmp_path / "out"), shard_size=4,
                          progress=False)
        assert ds.num_examples == 6
        assert ds.image_shape == (16, 16, 3)
        # Same pixels as decoding directly, in the same (sorted-name) order.
        np.testing.assert_array_equal(
            ds._gather(np.arange(6)), src._decode_batch(src.files))


class TestStreamIdentity:
    @pytest.mark.parametrize("kwargs", [
        dict(seed=0),
        dict(seed=7, start_epoch=2, start_batch=3),
        dict(seed=1, shard_index=1, shard_count=2),
    ])
    def test_bit_identical_to_array_dataset(self, corpus, store, kwargs):
        a = corpus.batches(16, **kwargs)
        b = store.batches(16, **kwargs)
        for ba, bb in itertools.islice(zip(a, b), 10):
            np.testing.assert_array_equal(ba, bb)

    def test_batch_too_large_raises(self, store):
        with pytest.raises(ValueError):
            next(store.batches(101))

    def test_prefetch_pipeline_compat(self, corpus, store):
        pipe = DataPipeline(store, 10, seed=4)
        ref = corpus.batches(10, seed=4)
        it = iter(pipe)
        try:
            for _ in range(5):
                np.testing.assert_array_equal(next(it), next(ref))
        finally:
            pipe.close()


class TestMaterializeAndDiscovery:
    def test_materialize_round_trip(self, corpus, store):
        arr = store.materialize()
        assert isinstance(arr, ArrayDataset)
        np.testing.assert_array_equal(arr.images, corpus.images)

    def test_load_celeba_discovers_shards(self, corpus, store, tmp_path):
        ds = load_celeba(path=str(tmp_path / "shards"), resolution=12)
        assert isinstance(ds, ShardedArrayDataset)
        assert ds.num_examples == 100

    def test_load_celeba_resolution_mismatch_raises(self, store, tmp_path):
        with pytest.raises(ValueError, match="resolution"):
            load_celeba(path=str(tmp_path / "shards"), resolution=64)

    def test_num_examples_cap(self, corpus, store, tmp_path):
        """ADVICE r3: --num_examples must cap the shard path too, with the
        stream equal to an ArrayDataset over the truncated concatenation."""
        capped = ShardedArrayDataset(str(tmp_path / "shards"),
                                     num_examples=50)
        assert capped.num_examples == 50
        truncated = ArrayDataset(corpus.images[:50])
        a = truncated.batches(16, seed=5)
        b = capped.batches(16, seed=5)
        for ba, bb in itertools.islice(zip(a, b), 8):
            np.testing.assert_array_equal(ba, bb)
        # materialize honours the cap (and reads only the needed shards)
        np.testing.assert_array_equal(capped.materialize().images,
                                      corpus.images[:50])
        # cap above the store size is a no-op, not an error
        assert ShardedArrayDataset(str(tmp_path / "shards"),
                                   num_examples=10_000).num_examples == 100

    def test_load_celeba_honors_cap_on_shard_path(self, store, tmp_path):
        ds = load_celeba(path=str(tmp_path / "shards"), resolution=12,
                         num_examples=40)
        assert isinstance(ds, ShardedArrayDataset)
        assert ds.num_examples == 40

    def test_inconsistent_shards_raise(self, tmp_path):
        d = tmp_path / "bad"
        d.mkdir()
        np.save(d / "shard-00000.npy",
                np.zeros((3, 8, 8, 3), np.uint8))
        np.save(d / "shard-00001.npy",
                np.zeros((3, 9, 9, 3), np.uint8))
        with pytest.raises(ValueError):
            ShardedArrayDataset(str(d))


@pytest.fixture(scope="module")
def make_shards_mod():
    spec = importlib.util.spec_from_file_location(
        "make_shards_cli", os.path.join(os.path.dirname(__file__), "..",
                                        "tools", "make_shards.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestMakeShardsCli:
    """ADVICE r3: --num_examples / --resolution must not be silently ignored
    for mnist.npz sources."""

    @pytest.fixture()
    def mnist_npz(self, tmp_path):
        rs = np.random.RandomState(1)
        path = tmp_path / "mnist.npz"
        np.savez(path, x_train=rs.randint(0, 256, (30, 28, 28), np.uint8),
                 x_test=rs.randint(0, 256, (5, 28, 28), np.uint8))
        return str(path)

    def _run(self, mod, monkeypatch, *argv):
        monkeypatch.setattr(sys, "argv", ["make_shards.py", *argv])
        mod.main()

    def test_npz_num_examples_cap(self, make_shards_mod, mnist_npz,
                                  tmp_path, monkeypatch):
        out = str(tmp_path / "capped")
        self._run(make_shards_mod, monkeypatch, mnist_npz, out,
                  "--num_examples", "12", "--shard_size", "8")
        assert ShardedArrayDataset(out).num_examples == 12

    def test_npz_resolution_flag_rejected(self, make_shards_mod, mnist_npz,
                                          tmp_path, monkeypatch):
        with pytest.raises(SystemExit, match="unsupported for"):
            self._run(make_shards_mod, monkeypatch, mnist_npz,
                      str(tmp_path / "x"), "--resolution", "64")

    def test_npz_default_resolution_ok(self, make_shards_mod, mnist_npz,
                                       tmp_path, monkeypatch):
        out = str(tmp_path / "full")
        self._run(make_shards_mod, monkeypatch, mnist_npz, out)
        ds = ShardedArrayDataset(out)
        assert ds.num_examples == 30
        assert ds.image_shape == (28, 28, 1)
