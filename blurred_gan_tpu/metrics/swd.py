"""Multi-scale sliced Wasserstein distance (SWD), on-device.

Capability parity with the reference's SWD stack
(/root/reference/sliced_wasserstein.py + /root/reference/metrics.py:93-157), which is
the NVIDIA ProGAN evaluation protocol:

- Laplacian pyramid from full resolution down to 16 px, built with a 5×5 binomial
  filter and mirror padding (sliced_wasserstein.py:65-88);
- per level, 128 random 7×7 patches per image (:13-23);
- descriptors normalised per channel over the whole set (:27-34);
- projected onto 4 repeats × 128 random unit directions, sorted, mean |Δ|
  (:38-51); reported per level as ``SWDx1e3_<res>`` plus the average
  (metrics.py:136-149).

The reference runs all of this in host numpy/scipy. Here every stage is JAX on
device: the pyramid is two depthwise convolutions (XLA fuses the stuffing/striding),
patch extraction is one gather driven by ``jax.random`` positions, and the
projection — the FLOPs-heavy stage, (nhoods×descriptor)·(descriptor×dirs) — is an MXU
matmul followed by an on-device sort. Arrays stay NHWC end-to-end (the TPU-native
layout); the reference's NCHW protocol detail that matters for parity — the
*descriptor component ordering* — is preserved by transposing each patch to (C, 7, 7)
before flattening.

Bug fixed (not reproduced): the reference builds its *fake* descriptors from the
real minibatch (metrics.py:131 uses ``real_minibatch`` in both loops), so its SWD
would always be ≈0. Here reals and fakes are, obviously, fed separately.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# 5×5 binomial ("Gaussian") filter, matching cv2.pyrDown/pyrUp
# (sliced_wasserstein.py:65-70).
_BINOMIAL_1D = np.float32([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0

NHOOD_SIZE = 7
NHOODS_PER_IMAGE = 128
DIR_REPEATS = 4
DIRS_PER_REPEAT = 128
MIN_RESOLUTION = 16


def swd_resolutions(resolution: int) -> List[int]:
    """Pyramid level resolutions: full res halved down to 16 (metrics.py:119-122).

    Below 16² (outside the reference protocol, which assumes ≥16) the pyramid
    would be empty — fall back to a single level at the native resolution so
    tiny-resolution runs (e.g. ``train_celeba --resolution 8``) still get a
    well-defined SWD instead of crashing on a zero-level extractor.
    """
    out = []
    res = resolution
    while res >= MIN_RESOLUTION:
        out.append(res)
        res //= 2
    return out or [resolution]


# ---------------------------------------------------------------------------
# Laplacian pyramid (device, NHWC)
# ---------------------------------------------------------------------------


def _binomial_blur(x, gain: float = 1.0):
    """Separable 5×5 binomial depthwise blur with mirror padding, NHWC.

    ``scipy.ndimage.convolve(..., mode='mirror')`` reflects about the edge sample
    (like ``jnp.pad(mode='reflect')``); padding manually keeps the convs VALID.
    """
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    taps = jnp.asarray(_BINOMIAL_1D * gain, x.dtype)
    k_row = jnp.tile(taps.reshape(1, 5, 1, 1), (1, 1, 1, c))
    k_col = jnp.tile(jnp.asarray(_BINOMIAL_1D, x.dtype).reshape(5, 1, 1, 1),
                     (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, k_row.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k_row, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return jax.lax.conv_general_dilated(
        y, k_col, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)


def pyr_down(x):
    """Blur then take even rows/cols — matches cv2.pyrDown
    (sliced_wasserstein.py:72-74). NHWC."""
    return _binomial_blur(x)[:, ::2, ::2, :]


def pyr_up(x):
    """Zero-stuff then blur with 4× gain — matches cv2.pyrUp
    (sliced_wasserstein.py:76-81). NHWC."""
    n, h, w, c = x.shape
    res = jnp.zeros((n, h * 2, w * 2, c), x.dtype)
    res = res.at[:, ::2, ::2, :].set(x)
    return _binomial_blur(res, gain=4.0)


def laplacian_pyramid(images, num_levels: int) -> List[jnp.ndarray]:
    """Laplacian pyramid, coarsest level last (sliced_wasserstein.py:83-88). NHWC."""
    pyramid = [images.astype(jnp.float32)]
    for _ in range(1, num_levels):
        down = pyr_down(pyramid[-1])
        pyramid[-1] = pyramid[-1] - pyr_up(down)
        pyramid.append(down)
    return pyramid


def reconstruct_laplacian_pyramid(pyramid: Sequence[jnp.ndarray]):
    """Inverse of :func:`laplacian_pyramid` (sliced_wasserstein.py:90-94)."""
    x = pyramid[-1]
    for level in pyramid[-2::-1]:
        x = pyr_up(x) + level
    return x


def downscale_minibatch(images, lod: int):
    """Average-pool 2× per level-of-detail step (sliced_wasserstein.py:55-61
    capability; NHWC float in, float out — the uint8 round-trip there was an
    artifact of its numpy pipeline)."""
    if lod == 0:
        return images
    x = images.astype(jnp.float32)
    for _ in range(lod):
        x = (x[:, 0::2, 0::2, :] + x[:, 0::2, 1::2, :]
             + x[:, 1::2, 0::2, :] + x[:, 1::2, 1::2, :]) * 0.25
    return x


# ---------------------------------------------------------------------------
# Patch descriptors
# ---------------------------------------------------------------------------


def patch_descriptors(level, rng, nhood_size: int = NHOOD_SIZE,
                      nhoods_per_image: int = NHOODS_PER_IMAGE):
    """Random ``nhood_size``² patches, ``nhoods_per_image`` per image. NHWC in,
    ``(N_img*nhoods, C*k*k)`` out with the reference's (C, y, x) component order
    (sliced_wasserstein.py:13-23).

    Positions are uniform over patch centres fully inside the image
    (``randint(H, S-H)`` semantics), drawn from ``jax.random`` instead of global
    numpy state so the metric is reproducible and device-resident.
    """
    n_img, s_h, s_w, c = level.shape
    half = nhood_size // 2
    n = n_img * nhoods_per_image
    kx, ky = jax.random.split(rng)
    x0 = jax.random.randint(kx, (n,), half, s_w - half) - half
    y0 = jax.random.randint(ky, (n,), half, s_h - half) - half
    img = jnp.arange(n, dtype=jnp.int32) // nhoods_per_image

    def take_patch(i, y, x):
        p = jax.lax.dynamic_slice(level, (i, y, x, 0),
                                  (1, nhood_size, nhood_size, c))
        return p[0]

    patches = jax.vmap(take_patch)(img, y0, x0)          # (N, k, k, C)
    patches = jnp.transpose(patches, (0, 3, 1, 2))       # (N, C, k, k) — ref order
    return patches.reshape(n, c * nhood_size * nhood_size)


def finalize_descriptors(desc, channels: int):
    """Normalise per channel over the full set (sliced_wasserstein.py:27-34).

    ``desc`` is ``(N, C*k*k)`` with (C, y, x) component order; mean/std are taken
    per channel across all patches and positions.
    """
    n = desc.shape[0]
    d = desc.reshape(n, channels, -1)
    mean = jnp.mean(d, axis=(0, 2), keepdims=True)
    std = jnp.std(d, axis=(0, 2), keepdims=True)
    d = (d - mean) / (std + 1e-12)
    return d.reshape(n, -1)


# ---------------------------------------------------------------------------
# Sliced Wasserstein distance
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dir_repeats", "dirs_per_repeat"))
def sliced_wasserstein_distance(a, b, rng, dir_repeats: int = DIR_REPEATS,
                                dirs_per_repeat: int = DIRS_PER_REPEAT):
    """Mean 1-D Wasserstein distance over random projections
    (sliced_wasserstein.py:38-51), fully on device.

    ``a``/``b`` are ``(N, D)`` descriptor sets. The projection is one
    ``(R*K, D) x (D, N)``-scale matmul (MXU) and the per-direction sort runs as a
    batched on-device sort — no host round-trip.
    """
    d = a.shape[1]

    def one_repeat(key):
        dirs = jax.random.normal(key, (d, dirs_per_repeat), jnp.float32)
        dirs = dirs / jnp.sqrt(jnp.sum(dirs**2, axis=0, keepdims=True))
        pa = jnp.sort(a @ dirs, axis=0)
        pb = jnp.sort(b @ dirs, axis=0)
        return jnp.mean(jnp.abs(pa - pb))

    keys = jax.random.split(rng, dir_repeats)
    return jnp.mean(jax.vmap(one_repeat)(keys))


# ---------------------------------------------------------------------------
# Streaming metric (the reference's SWDMetric protocol, bug-fixed)
# ---------------------------------------------------------------------------


class SWDAPI:
    """The reference's standalone evaluation protocol
    (sliced_wasserstein.py:98-133): ``begin(mode)`` → ``feed(mode, batch)``* →
    ``end(mode)``; 'warmup'/'reals' set the real-descriptor bank, 'fakes'
    returns ``[SWD×1e3 per level..., average]``. NHWC batches.
    """

    def __init__(self, image_shape, seed: int = 0):
        # image_shape: (H, W, C) or (N, H, W, C)-like; uses the H entry.
        res = image_shape[1] if len(image_shape) == 4 else image_shape[0]
        self._metric = SWDMetric(seed=seed)
        self._metric._build(res, image_shape[-1])
        self.resolutions = self._metric.resolutions
        self.desc_real = None
        self._descriptors = None
        self._n = 0

    def get_metric_names(self) -> List[str]:
        return self._metric.get_metric_names()

    def begin(self, mode: str) -> None:
        assert mode in ("warmup", "reals", "fakes")
        self._descriptors = [[] for _ in self.resolutions]

    def feed(self, mode: str, minibatch) -> None:
        self._n += 1
        k = jax.random.fold_in(self._metric._rng, self._n)
        for lod, desc in enumerate(
                self._metric._extract(jnp.asarray(minibatch), k)):
            self._descriptors[lod].append(desc)

    def end(self, mode: str) -> List[float]:
        desc = [finalize_descriptors(jnp.concatenate(d, axis=0),
                                     self._metric._channels)
                for d in self._descriptors]
        self._descriptors = None
        if mode in ("warmup", "reals"):
            self.desc_real = desc
        dist = []
        for lod, (dr, df) in enumerate(zip(self.desc_real, desc)):
            k = jax.random.fold_in(self._metric._rng, 20_000 + lod)
            dist.append(float(sliced_wasserstein_distance(
                dr, df, k, self._metric.dir_repeats,
                self._metric.dirs_per_repeat)) * 1e3)
        return dist + [float(np.mean(dist))]


class SWDMetric:
    """Streaming multi-scale SWD with the reference's update/result protocol
    (metrics.py:93-157): feed (reals, fakes) minibatches, then ``results()`` returns
    ``{'SWDx1e3_<res>': v, ..., 'SWDx1e3_avg': v}``.

    Descriptor extraction happens per minibatch on device (jitted once per level
    shape); only the final scalar distances are pulled to host.
    """

    name = "SWDx1e3_avg"

    def __init__(self, nhood_size: int = NHOOD_SIZE,
                 nhoods_per_image: int = NHOODS_PER_IMAGE,
                 dir_repeats: int = DIR_REPEATS,
                 dirs_per_repeat: int = DIRS_PER_REPEAT,
                 seed: int = 0):
        self.nhood_size = nhood_size
        self.nhoods_per_image = nhoods_per_image
        self.dir_repeats = dir_repeats
        self.dirs_per_repeat = dirs_per_repeat
        self.resolutions: List[int] = []
        self._rng = jax.random.PRNGKey(seed)
        self._n_updates = 0
        self.real_descriptors: List[List[jnp.ndarray]] = []
        self.fake_descriptors: List[List[jnp.ndarray]] = []
        self._extract = None

    def _build(self, resolution: int, channels: int):
        self.resolutions = swd_resolutions(resolution)
        self.real_descriptors = [[] for _ in self.resolutions]
        self.fake_descriptors = [[] for _ in self.resolutions]
        self._channels = channels
        num_levels = len(self.resolutions)

        @jax.jit
        def extract(batch, rng):
            keys = jax.random.split(rng, num_levels)
            return [
                patch_descriptors(level, keys[i], self.nhood_size,
                                  self.nhoods_per_image)
                for i, level in enumerate(laplacian_pyramid(batch, num_levels))
            ]

        self._extract = extract

    def update_state(self, real_minibatch, fake_minibatch) -> None:
        """Accumulate descriptors for one NHWC minibatch pair.

        (Fixes metrics.py:131 — fakes come from the fake minibatch.)
        """
        real_minibatch = jnp.asarray(real_minibatch)
        fake_minibatch = jnp.asarray(fake_minibatch)
        if not self.resolutions:
            self._build(real_minibatch.shape[1], real_minibatch.shape[3])
        self._n_updates += 1
        k = jax.random.fold_in(self._rng, self._n_updates)
        k_real, k_fake = jax.random.split(k)
        for lod, desc in enumerate(self._extract(real_minibatch, k_real)):
            self.real_descriptors[lod].append(desc)
        for lod, desc in enumerate(self._extract(fake_minibatch, k_fake)):
            self.fake_descriptors[lod].append(desc)

    def reset_states(self) -> None:
        for d in self.real_descriptors:
            d.clear()
        for d in self.fake_descriptors:
            d.clear()

    def cross_process_merge(self, allgather) -> None:
        """Replace this process's descriptor banks with the union across all
        hosts, so ``results()`` is the GLOBAL SWD — exact (descriptors are
        pre-normalisation, and ``finalize_descriptors`` then normalises over
        the merged set, identical to a single host having seen every patch).
        ``allgather(array) -> [per-process arrays]``. Cost: the raw
        descriptor tensors cross the network (~75 MB/level/side at the
        1000-image protocol) — fine at eval cadence."""
        for bank in (self.real_descriptors, self.fake_descriptors):
            for lod in range(len(bank)):
                local = np.asarray(jnp.concatenate(bank[lod], axis=0))
                bank[lod] = [jnp.asarray(np.concatenate(
                    [np.asarray(p) for p in allgather(local)], axis=0))]

    def get_metric_names(self) -> List[str]:
        return [f"SWDx1e3_{res}" for res in self.resolutions] + ["SWDx1e3_avg"]

    def results(self) -> Dict[str, float]:
        dists = []
        for lod in range(len(self.resolutions)):
            dr = finalize_descriptors(
                jnp.concatenate(self.real_descriptors[lod], axis=0),
                self._channels)
            df = finalize_descriptors(
                jnp.concatenate(self.fake_descriptors[lod], axis=0),
                self._channels)
            k = jax.random.fold_in(self._rng, 10_000 + lod)
            dists.append(float(sliced_wasserstein_distance(
                dr, df, k, self.dir_repeats, self.dirs_per_repeat)) * 1e3)
        dists.append(float(np.mean(dists)))
        return dict(zip(self.get_metric_names(), dists))

    def result(self) -> float:
        return self.results()["SWDx1e3_avg"]
