"""Image utilities: normalisation, sample grids, layout transposes.

Capability parity with /root/reference/utils.py:50-96 (``normalize_images``,
``samples_grid``/``plot_to_image``, NHWC<->NCHW). Grids are rendered with numpy + PIL
(no matplotlib on the hot path) and returned as HWC uint8 arrays that go either to a
PNG on disk or to the TensorBoard writer.
"""

from __future__ import annotations

import numpy as np


def normalize_images(images):
    """[-1, 1] -> [0, 1] (utils.py:50-52)."""
    return (images + 1.0) / 2.0


def NHWC_to_NCHW(images):
    return np.transpose(np.asarray(images), (0, 3, 1, 2))


def NCHW_to_NHWC(images):
    return np.transpose(np.asarray(images), (0, 2, 3, 1))


def samples_grid(samples, grid=(8, 8), pad: int = 2) -> np.ndarray:
    """Tile NHWC samples (values in [0, 1]) into one HWC uint8 image.

    Equivalent artifact to the reference's matplotlib 8x8 grid
    (utils.py:73-88) without the figure round-trip.
    """
    samples = np.asarray(samples)
    rows, cols = grid
    n = rows * cols
    samples = samples[:n]
    b, h, w, c = samples.shape
    if b < n:  # pad with black tiles
        samples = np.concatenate(
            [samples, np.zeros((n - b, h, w, c), samples.dtype)], axis=0)
    img = np.ones((rows * (h + pad) + pad, cols * (w + pad) + pad, c),
                  dtype=np.float32)
    for i in range(rows):
        for j in range(cols):
            y, x = pad + i * (h + pad), pad + j * (w + pad)
            img[y:y + h, x:x + w] = samples[i * cols + j]
    img = np.clip(img, 0.0, 1.0)
    if c == 1:
        img = np.repeat(img, 3, axis=-1)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_image_grid(samples, path: str, grid=(8, 8)) -> np.ndarray:
    """Render a grid and save it as PNG; returns the HWC uint8 array."""
    img = samples_grid(samples, grid=grid)
    from PIL import Image

    Image.fromarray(img).save(path)
    return img
