"""Host-side input pipelines feeding the device train step.

Capability parity with the reference's tf.data pipelines
(/root/reference/demo_mnist.py:17-45, demo_celeba.py:15-48): dataset → decode →
normalise to [-1, 1] → (resize) → cache → shuffle → batch → prefetch. TPU-first
redesign:

- Batches cross the host→device boundary as **uint8** and are normalised on-chip
  inside the jitted step (train/step.py) — 4× less PCIe/DMA traffic than shipping
  float32, and the normalisation fuses into the first conv's prologue.
- Shuffling is an index-permutation pass over a memory-resident uint8 store (MNIST
  is 45 MB; CelebA-128 at uint8 is ~9.5 GB — for larger-than-RAM corpora use
  :func:`image_folder_dataset`, which keeps only file paths in memory, draws a
  full fresh permutation of them each epoch, and decodes per batch on the
  prefetch thread; or convert once with :func:`write_shards` /
  ``tools/make_shards.py`` and stream the mmap'd
  :class:`ShardedArrayDataset` with zero decode cost).
- **Prefetch** runs on a background thread with a bounded queue so JPEG decode /
  permutation overlaps device compute (the tf.data AUTOTUNE capability,
  demo_mnist.py:39-43).
- Every epoch's permutation derives from a seed + epoch counter, so a resumed run
  re-creates the exact stream position (checkpoint/resume parity, SURVEY.md §5.4).

Dataset sources: ``load_mnist`` / ``load_celeba`` read standard local files
(``mnist.npz`` Keras layout; a directory of CelebA JPEGs) from ``$DATASETS_DIR`` or
an explicit path — matching the reference's ``$DATASETS_DIR`` convention
(demo_mnist.py:33). When no local data exists (e.g. an air-gapped box) they fall
back to :func:`synthetic_dataset`, a deterministic procedural corpus with matching
shapes, and say so loudly — training plumbing stays exercisable anywhere.
"""

from __future__ import annotations

import os
import queue
import sys
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class ArrayDataset:
    """A memory-resident uint8 NHWC image store with epoch-seeded shuffling."""

    def __init__(self, images: np.ndarray, name: str = "array"):
        assert images.ndim == 4 and images.dtype == np.uint8, \
            "expected uint8 NHWC"
        self.images = images
        self.name = name

    @property
    def num_examples(self) -> int:
        return self.images.shape[0]

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return tuple(self.images.shape[1:])

    def batches(self, batch_size: int, *, seed: int = 0, start_epoch: int = 0,
                start_batch: int = 0, shard_index: int = 0,
                shard_count: int = 1,
                drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """Infinite epoch-shuffled uint8 batch stream.

        ``start_epoch``/``start_batch`` resume the deterministic stream
        mid-run (checkpoint/resume contract: position is pure index math, no
        batches are decoded just to be skipped). ``shard_index/shard_count``
        give multi-host processes disjoint strided shards of the *same*
        epoch permutation (each example appears once per epoch globally).
        """
        epoch = start_epoch
        n = self.num_examples
        first = start_batch * batch_size
        while True:
            order = np.random.RandomState(seed + epoch).permutation(n)
            # Truncate to a multiple of shard_count so every process's shard
            # has identical length (uneven shards would desync multi-host
            # epochs and break the resume index math).
            order = order[:n - (n % shard_count)][shard_index::shard_count]
            m = len(order)
            if drop_remainder and batch_size > m:
                # Otherwise the stream yields nothing per epoch and a
                # prefetching consumer blocks forever on an empty queue.
                raise ValueError(
                    f"batch_size {batch_size} exceeds this shard's {m} "
                    f"examples (num_examples={n}, shard_count={shard_count})")
            end = m - (m % batch_size) if drop_remainder else m
            for i in range(first, end, batch_size):
                yield self.images[order[i:i + batch_size]]
            epoch += 1
            first = 0


def synthetic_dataset(image_shape: Tuple[int, int, int] = (28, 28, 1),
                      num_examples: int = 4096, seed: int = 0,
                      ) -> ArrayDataset:
    """Deterministic procedural images (blobs of varying position/scale/phase).

    Not noise: images have spatial structure at several scales so blur schedules,
    SWD pyramids and FID features all produce meaningful, reproducible numbers in
    tests and benchmarks.
    """
    h, w, c = image_shape
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / h, xx / w
    out = np.empty((num_examples, h, w, c), np.uint8)
    for i in range(num_examples):
        img = np.zeros((h, w), np.float32)
        for _ in range(3):
            cy, cx = rng.rand(2)
            s = 0.03 + 0.12 * rng.rand()
            a = 0.4 + 0.6 * rng.rand()
            img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        fy, fx, ph = rng.rand(3)
        img += 0.2 * np.sin(2 * np.pi * (3 * fy * yy + 3 * fx * xx + ph))
        img = (img - img.min()) / (np.ptp(img) + 1e-6)
        for ch in range(c):
            gain = 1.0 if c == 1 else 0.6 + 0.4 * rng.rand()
            out[i, :, :, ch] = np.uint8(np.clip(img * gain * 255, 0, 255))
    return ArrayDataset(out, name=f"synthetic{h}x{w}x{c}")


def _datasets_dir() -> str:
    return os.environ.get("DATASETS_DIR", os.path.expanduser("~/datasets"))


def load_mnist(path: Optional[str] = None, split: str = "train",
               allow_synthetic_fallback: bool = True) -> ArrayDataset:
    """MNIST 28×28×1 from a local ``mnist.npz`` (Keras layout: x_train/x_test).

    Reference pipeline semantics (demo_mnist.py:17-45): train split, 60k examples.
    Searches ``path``, ``$DATASETS_DIR/mnist.npz``, ``~/.keras/datasets/mnist.npz``.
    """
    candidates = [path] if path else [
        os.path.join(_datasets_dir(), "mnist.npz"),
        os.path.expanduser("~/.keras/datasets/mnist.npz"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            with np.load(cand) as d:
                x = d["x_train" if split == "train" else "x_test"]
            return ArrayDataset(x[..., None].astype(np.uint8), name="mnist")
    if not allow_synthetic_fallback:
        raise FileNotFoundError(
            f"mnist.npz not found in {candidates}; set $DATASETS_DIR or pass path=")
    print("[data] mnist.npz not found locally - using deterministic synthetic "
          "28x28x1 surrogate (60000 examples)")
    return synthetic_dataset((28, 28, 1), num_examples=60_000)


def load_celeba(path: Optional[str] = None, resolution: int = 128,
                num_examples: Optional[int] = None,
                allow_synthetic_fallback: bool = True):
    """CelebA at ``resolution``² from a local directory of aligned JPEGs.

    Reference pipeline semantics (demo_celeba.py:15-48): ALL split (202,599
    images), centre-crop then resize to resolution², [-1, 1] normalisation (done
    on device here). Searches ``path`` then ``$DATASETS_DIR/celeba*/``.
    """
    candidates = [path] if path else [
        os.path.join(_datasets_dir(), f"celeba_shards_{resolution}"),
        os.path.join(_datasets_dir(), "celeba", "img_align_celeba"),
        os.path.join(_datasets_dir(), "celeb_a"),
        os.path.join(_datasets_dir(), "celeba"),
    ]
    for cand in candidates:
        if cand and os.path.isdir(cand):
            # A pre-converted shard store (tools/make_shards.py) wins: no
            # JPEG decode on the training path.
            if any(n.startswith(_SHARD_PREFIX) and n.endswith(".npy")
                   for n in os.listdir(cand)):
                ds = ShardedArrayDataset(cand, num_examples=num_examples)
                if ds.image_shape[:2] != (resolution, resolution):
                    raise ValueError(
                        f"{cand} holds {ds.image_shape[0]}px shards but "
                        f"resolution={resolution} was requested — convert "
                        f"with tools/make_shards.py at the right resolution")
                return ds
            return image_folder_dataset(cand, resolution=resolution,
                                        num_examples=num_examples)
    if not allow_synthetic_fallback:
        raise FileNotFoundError(
            f"no CelebA image dir found in {candidates}")
    n = min(num_examples or 202_599, 20_000)  # cap the procedural corpus
    print(f"[data] CelebA not found locally - using deterministic synthetic "
          f"{resolution}x{resolution}x3 surrogate ({n} examples)")
    return synthetic_dataset((resolution, resolution, 3), num_examples=n)


class ImageFolderDataset:
    """Lazily-decoded image-directory dataset with full per-epoch shuffling
    (a fresh permutation of the file list each epoch; only paths stay in RAM).

    For corpora too large to hold decoded in RAM (CelebA-128 ≈ 9.5 GB uint8).
    Decode happens on the prefetch thread; images are centre-cropped to square
    then resized to ``resolution``² (the reference's CelebA preprocessing,
    demo_celeba.py:24-40).
    """

    def __init__(self, root: str, resolution: int,
                 num_examples: Optional[int] = None,
                 extensions: Sequence[str] = (".jpg", ".jpeg", ".png")):
        self.root = root
        self.resolution = resolution
        files: List[str] = []
        for name in sorted(os.listdir(root)):
            if name.lower().endswith(tuple(extensions)):
                files.append(os.path.join(root, name))
            if num_examples and len(files) >= num_examples:
                break
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        self.files = files
        self.name = f"folder:{os.path.basename(root)}@{resolution}"

    @property
    def num_examples(self) -> int:
        return len(self.files)

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return (self.resolution, self.resolution, 3)

    def _decode(self, fp: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(fp).convert("RGB")
        w, h = img.size
        side = min(w, h)
        img = img.crop(((w - side) // 2, (h - side) // 2,
                        (w + side) // 2, (h + side) // 2))
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def _decode_batch(self, paths) -> np.ndarray:
        """Native C++ multithreaded decode (blurred_gan_tpu/native) with a PIL
        fallback. The native path decodes/crops/resizes the whole batch in
        parallel — the difference between starving the TPU (~250 ms/batch in
        PIL) and keeping up with a ~10 ms train step."""
        from blurred_gan_tpu import native

        if native.available():
            return native.decode_batch(paths, self.resolution)
        return np.stack([self._decode(p) for p in paths])

    def materialize(self, decode_batch: int = 512,
                    progress: bool = True) -> "ArrayDataset":
        """Decode the whole folder into a memory-resident uint8
        :class:`ArrayDataset` — the bridge from lazy real-data folders to
        device-resident chunked training, which needs ``.images`` to park in
        HBM (CelebA-128 uint8 is ~9.5 GB and fits a 16 GB v5e alongside the
        model). Decoding uses the native parallel loader in ``decode_batch``
        chunks; file (sorted-name) order is preserved so resume/shuffle
        semantics are reproducible across materializations."""
        n = len(self.files)
        out = np.empty((n, self.resolution, self.resolution, 3), np.uint8)
        for i in range(0, n, decode_batch):
            out[i:i + decode_batch] = self._decode_batch(
                self.files[i:i + decode_batch])
            if progress and (i // decode_batch) % 20 == 0:
                # stderr: several CLIs (tools/score.py) reserve stdout for
                # their one-line JSON contract.
                print(f"[data] materializing {self.name}: {i}/{n}",
                      file=sys.stderr, flush=True)
        return ArrayDataset(out, name=f"{self.name}:materialized")

    def batches(self, batch_size: int, *, seed: int = 0, start_epoch: int = 0,
                start_batch: int = 0, shard_index: int = 0,
                shard_count: int = 1,
                drop_remainder: bool = True) -> Iterator[np.ndarray]:
        epoch = start_epoch
        n = len(self.files)
        first = start_batch * batch_size
        while True:
            order = np.random.RandomState(seed + epoch).permutation(n)
            order = order[:n - (n % shard_count)][shard_index::shard_count]
            m = len(order)
            if drop_remainder and batch_size > m:
                raise ValueError(
                    f"batch_size {batch_size} exceeds this shard's {m} "
                    f"examples (num_examples={n}, shard_count={shard_count})")
            end = m - (m % batch_size) if drop_remainder else m
            for i in range(first, end, batch_size):
                idx = order[i:i + batch_size]
                yield self._decode_batch([self.files[j] for j in idx])
            epoch += 1
            first = 0


def image_folder_dataset(root: str, resolution: int = 128,
                         num_examples: Optional[int] = None):
    return ImageFolderDataset(root, resolution, num_examples)


_SHARD_PREFIX = "shard-"


class ShardedArrayDataset:
    """Memory-mapped uint8 NHWC shard store: a directory of ``shard-*.npy``.

    The decode-once, stream-forever format for larger-than-RAM corpora (the
    TPU-side answer to the reference's tfds/TFRecord cache,
    demo_celeba.py:15-48): write once with :func:`write_shards` — e.g. from an
    :class:`ImageFolderDataset` — then every later run memory-maps the shards
    and gathers per batch. No JPEG decode on the training path, the OS page
    cache keeps the hot set resident, and cold batches cost one strided read
    per touched shard instead of ``batch_size`` image decodes.

    The batch stream is **bit-identical** to an :class:`ArrayDataset` over the
    concatenated array (same permutation math, same seed), so the
    checkpoint/resume and multi-host shard contracts carry over unchanged —
    a run can switch between the two storage forms without moving its stream
    position.

    ``num_examples`` caps the store to its first N examples (in shard-name
    order) — the stream then equals an :class:`ArrayDataset` over the
    truncated concatenation, so ``--num_examples`` behaves identically on the
    shard and image-folder paths (it used to be silently ignored here).
    """

    def __init__(self, root: str, num_examples: Optional[int] = None):
        names = sorted(n for n in os.listdir(root)
                       if n.startswith(_SHARD_PREFIX) and n.endswith(".npy"))
        if not names:
            raise FileNotFoundError(f"no {_SHARD_PREFIX}*.npy under {root}")
        self.root = root
        self._shards = [np.load(os.path.join(root, n), mmap_mode="r")
                        for n in names]
        shape0 = self._shards[0].shape[1:]
        for n, s in zip(names, self._shards):
            if s.ndim != 4 or s.dtype != np.uint8 or s.shape[1:] != shape0:
                raise ValueError(
                    f"{n}: expected uint8 NHWC with image shape {shape0}, "
                    f"got {s.dtype} {s.shape}")
        # _starts[i] = global index of shard i's first example.
        counts = [s.shape[0] for s in self._shards]
        self._starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        self._total = int(sum(counts))
        if num_examples:
            self._total = min(self._total, int(num_examples))
        self.name = f"shards:{os.path.basename(os.path.abspath(root))}"

    @property
    def num_examples(self) -> int:
        return self._total

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return tuple(self._shards[0].shape[1:])

    def _gather(self, idx: np.ndarray) -> np.ndarray:
        """Fancy-index the virtual concatenated array, one read per touched
        shard (preserving the requested order)."""
        out = np.empty((len(idx), *self.image_shape), np.uint8)
        shard_ids = np.searchsorted(self._starts, idx, side="right") - 1
        for s in np.unique(shard_ids):
            mask = shard_ids == s
            out[mask] = self._shards[s][idx[mask] - self._starts[s]]
        return out

    def materialize(self) -> "ArrayDataset":
        """Concatenate the (capped) store into RAM — the bridge to
        device-resident chunked training (same role as
        ImageFolderDataset.materialize). Only the shards inside the
        ``num_examples`` cap are read."""
        parts, remaining = [], self._total
        for s in self._shards:
            take = min(remaining, s.shape[0])
            if take <= 0:
                break
            parts.append(np.asarray(s[:take]))
            remaining -= take
        return ArrayDataset(np.concatenate(parts),
                            name=f"{self.name}:materialized")

    def batches(self, batch_size: int, *, seed: int = 0, start_epoch: int = 0,
                start_batch: int = 0, shard_index: int = 0,
                shard_count: int = 1,
                drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """Same stream contract (and values) as ``ArrayDataset.batches``."""
        epoch = start_epoch
        n = self.num_examples
        first = start_batch * batch_size
        while True:
            order = np.random.RandomState(seed + epoch).permutation(n)
            order = order[:n - (n % shard_count)][shard_index::shard_count]
            m = len(order)
            if drop_remainder and batch_size > m:
                raise ValueError(
                    f"batch_size {batch_size} exceeds this shard's {m} "
                    f"examples (num_examples={n}, shard_count={shard_count})")
            end = m - (m % batch_size) if drop_remainder else m
            for i in range(first, end, batch_size):
                yield self._gather(order[i:i + batch_size])
            epoch += 1
            first = 0


def write_shards(source, root: str, shard_size: int = 4096,
                 progress: bool = True) -> "ShardedArrayDataset":
    """Write ``source`` as a ``shard-*.npy`` directory and reopen it mmap'd.

    ``source`` may be a uint8 NHWC array, an :class:`ArrayDataset`, or an
    :class:`ImageFolderDataset` — the folder case decodes one shard at a time
    (native parallel loader), so corpora larger than RAM convert in bounded
    memory. Sorted-name order is preserved, so the shard store's example
    order equals the source's.
    """
    os.makedirs(root, exist_ok=True)
    stale = [n for n in os.listdir(root)
             if n.startswith(_SHARD_PREFIX) and n.endswith(".npy")]
    if stale:
        raise FileExistsError(
            f"{root} already holds {len(stale)} shard files; refusing to mix "
            f"two corpora — point write_shards at an empty directory")

    if isinstance(source, ImageFolderDataset):
        n = source.num_examples

        def chunk(i):
            return source._decode_batch(source.files[i:i + shard_size])
    else:
        images = source.images if isinstance(source, ArrayDataset) else \
            np.asarray(source)
        assert images.ndim == 4 and images.dtype == np.uint8, \
            "expected uint8 NHWC"
        n = images.shape[0]

        def chunk(i):
            return images[i:i + shard_size]

    for k, i in enumerate(range(0, n, shard_size)):
        np.save(os.path.join(root, f"{_SHARD_PREFIX}{k:05d}.npy"), chunk(i))
        if progress and k % 20 == 0:
            print(f"[data] writing shards: {i}/{n}", file=sys.stderr,
                  flush=True)
    return ShardedArrayDataset(root)


class DataPipeline:
    """Background-thread prefetch over a dataset's batch stream.

    ``DataPipeline(ds, batch_size).__iter__()`` yields uint8 NHWC numpy batches
    while the next ones decode/permute concurrently (bounded queue, default depth
    2 — the tf.data ``prefetch(AUTOTUNE)`` capability, demo_mnist.py:39-43).
    """

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 start_epoch: int = 0, start_batch: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.start_epoch = start_epoch
        self.start_batch = start_batch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._queue: Optional[queue.Queue] = None

    @property
    def steps_per_epoch(self) -> int:
        return (self.dataset.num_examples
                // self.shard_count // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        self._queue = queue.Queue(maxsize=self.prefetch)
        self._stop.clear()

        def put(item) -> bool:
            while True:
                try:
                    self._queue.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    if self._stop.is_set():
                        return False

        def worker():
            # A decode error must surface in the consumer, not silently kill
            # this thread (which would hang training on an untimed get()).
            try:
                it = self.dataset.batches(self.batch_size, seed=self.seed,
                                          start_epoch=self.start_epoch,
                                          start_batch=self.start_batch,
                                          shard_index=self.shard_index,
                                          shard_count=self.shard_count)
                for batch in it:
                    if self._stop.is_set() or not put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised by consumer
                put(e)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        try:
            while True:
                item = self._queue.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            self.close()

    def close(self) -> None:
        self._stop.set()
        if self._queue is not None:
            try:  # unblock a worker stuck on put()
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
