"""ShardedArrayDataset / write_shards: the decode-once mmap shard store.

Core contract: the shard store's batch stream is bit-identical to an
ArrayDataset over the concatenated array — resume, multi-host sharding and
prefetch semantics carry over unchanged (data/pipeline.py)."""

import itertools

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

    def test_inconsistent_shards_raise(self, tmp_path):
        d = tmp_path / "bad"
        d.mkdir()
        np.save(d / "shard-00000.npy",
                np.zeros((3, 8, 8, 3), np.uint8))
        np.save(d / "shard-00001.npy",
                np.zeros((3, 9, 9, 3), np.uint8))
        with pytest.raises(ValueError):
            ShardedArrayDataset(str(d))
