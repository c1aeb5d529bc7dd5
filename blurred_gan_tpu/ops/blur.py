"""Separable 2-D Gaussian blur, TPU-first.

Capability parity with the reference's ``gaussian_blur.py`` (see
``/root/reference/gaussian_blur.py:15-132``): a separable Gaussian blur whose standard
deviation is a *runtime* knob turned by the training loop every batch, with the
reference's exact kernel-sizing policy:

    kernel_size = floor(6*std) + 1            (gaussian_blur.py:21-26)
    kernel_size = clip(kernel_size, 3, res)   (gaussian_blur.py:67)
    std         = max((kernel_size-1)/6, .01) (gaussian_blur.py:29-31,71-72)
    taps        = 2*floor(kernel_size/2) + 1  (gaussian_blur.py:84, tf.range(-k//2, k//2+1))

The reference implements this as two dynamic-size ``tf.nn.depthwise_conv2d`` calls,
which makes the op's *shape* a function of sigma — on TPU a naive port would recompile
the whole program every time the blur schedule moves. This module is designed so that
**sigma is a traced scalar and every shape is static**:

1.  The tap buffer has a fixed size ``K = 2*(resolution//2) + 1`` (the largest the
    policy can ever produce). Taps beyond the sigma-dependent effective half-width are
    masked to exactly zero *before* normalisation, so the result is bit-comparable to
    the dynamic-size reference while XLA sees a single static program.

2.  The two 1-D convolutions are expressed as **banded (Toeplitz) matmuls**:
    ``out = T_h @ X @ T_w^T`` per image plane. On TPU this runs on the 128x128 MXU
    systolic array (a perfect tile for CelebA-128) instead of a VPU-bound depthwise
    conv, and XLA batches it over N*C planes. ``ops/blur_pallas.py`` additionally fuses
    both passes into one kernel so the intermediate never touches HBM.

Zero-padding "SAME" semantics match the reference (TF pads with zeros, so border rows
of the band matrix sum to < 1 — intentionally not renormalised per-row).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sizing policy (mirrors /root/reference/gaussian_blur.py:15-31 semantics)
# ---------------------------------------------------------------------------


def appropriate_kernel_size(std):
    """Kernel size the reference derives for a given sigma: ``floor(6*std) + 1``.

    (The reference computes ``(6*std)*2 // 2 + 1`` in float arithmetic, which is
    ``floor(6*std) + 1``; /root/reference/gaussian_blur.py:21-26.)
    """
    return jnp.floor(6.0 * std) + 1.0


def appropriate_std(kernel_size):
    """Sigma that 'fills' a kernel of the given size: ``(k - 1) / 6``.

    (/root/reference/gaussian_blur.py:29-31.)
    """
    return (kernel_size - 1.0) / 6.0


def maximum_reasonable_std(image_resolution: int) -> float:
    """Largest sigma worth using at a given resolution.

    (/root/reference/gaussian_blur.py:15-18: sigma for a kernel of size res-1.)
    """
    return float(image_resolution - 1 - 1) / 6.0


def max_taps(resolution: int) -> int:
    """Static tap-buffer size: the largest odd tap count the policy can produce.

    kernel_size is clipped to ``resolution`` and the reference materialises
    ``2*floor(kernel_size/2) + 1`` taps (gaussian_blur.py:84).
    """
    return 2 * (resolution // 2) + 1


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def gaussian_kernel_1d(std, kernel_size: int):
    """1-D Gaussian taps, sum-normalised. ``kernel_size`` is a static python int.

    Matches /root/reference/gaussian_blur.py:83-88: taps at integer offsets
    ``-(k//2) .. k//2`` (so an even ``k`` still yields an odd tap count).
    """
    half = kernel_size // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    g = jnp.exp(-(x**2) / (2.0 * std**2)) / (math.sqrt(2.0 * math.pi) * std)
    return g / jnp.sum(g)


def effective_blur_params(scale, resolution: int):
    """Apply the reference's clip-then-rederive policy to a requested sigma.

    Returns ``(sigma_eff, half_width)`` — both traced float32 scalars. ``half_width``
    is the number of taps on each side of the centre that are active
    (taps with ``|offset| > half_width`` are exactly zero).

    Mirrors /root/reference/gaussian_blur.py:60-73.
    """
    scale = jnp.asarray(scale, jnp.float32)
    kernel_size = appropriate_kernel_size(scale)
    kernel_size = jnp.clip(kernel_size, 3.0, float(resolution))
    sigma_eff = jnp.maximum(appropriate_std(kernel_size), 0.01)
    half_width = jnp.floor(kernel_size / 2.0)
    return sigma_eff, half_width


def masked_gaussian_taps(scale, resolution: int):
    """Fixed-size tap vector for a traced sigma.

    Returns a ``(max_taps(resolution),)`` float32 vector equal to the reference's
    dynamic-size kernel zero-extended to the static buffer, normalised over the
    active taps only. All shapes static; ``scale`` is traced.
    """
    sigma, half = effective_blur_params(scale, resolution)
    k = max_taps(resolution)
    x = jnp.arange(-(k // 2), k // 2 + 1, dtype=jnp.float32)
    mask = jnp.abs(x) <= half
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = jnp.where(mask, g, 0.0)
    return g / jnp.sum(g)


def blur_matrix(scale, dim: int, resolution: int | None = None, dtype=jnp.float32):
    """Banded Toeplitz matrix ``T`` with ``T[i, j] = taps[j - i]`` (zero off-band).

    ``(T @ plane)`` blurs columns; ``(plane @ T.T)`` blurs rows — together they
    realise the separable blur with zero-padded SAME semantics, entirely as matmuls
    on the MXU. ``scale`` is a traced scalar; ``dim``/``resolution`` are static.

    ``resolution`` is the policy resolution (the reference clips the kernel to
    ``max(h, w)``, gaussian_blur.py:58,67); defaults to ``dim``.
    """
    resolution = dim if resolution is None else resolution
    sigma, half = effective_blur_params(scale, resolution)
    i = jax.lax.broadcasted_iota(jnp.float32, (dim, dim), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (dim, dim), 1)
    d = j - i
    active = jnp.abs(d) <= half
    g = jnp.exp(-(d**2) / (2.0 * sigma**2))
    band = jnp.where(active, g, 0.0)
    # Normalise by the *full kernel* sum (not per-row): zero-padding SAME semantics.
    offs = jnp.arange(-(max_taps(resolution) // 2), max_taps(resolution) // 2 + 1,
                      dtype=jnp.float32)
    norm = jnp.sum(
        jnp.where(jnp.abs(offs) <= half, jnp.exp(-(offs**2) / (2.0 * sigma**2)), 0.0)
    )
    return (band / norm).astype(dtype)


# ---------------------------------------------------------------------------
# Blur entry points
# ---------------------------------------------------------------------------


def blur_images(images, scale, *, precision=jax.lax.Precision.HIGHEST,
                impl: str = "auto"):
    """Gaussian-blur a batch of NHWC images with a traced sigma ``scale``.

    The TPU-native path: two banded matmuls per plane (MXU), static shapes, no
    recompilation as the schedule moves sigma. Capability-equivalent to
    /root/reference/gaussian_blur.py:50-80 (``blur_images``) including the sizing
    policy and zero-pad SAME borders.

    ``impl``: "auto"/"pallas" route through the ``blur_planes`` primitive,
    whose *lowering* is platform-split (the fused Pallas kernel on TPU, the
    einsum formulation everywhere else) — keyed off the compilation platform
    rather than a host-side backend-name check, so the dispatch decision and
    the lowering can never disagree. "einsum" forces the plain-XLA einsum
    path (the A/B baseline and a debugging escape hatch).
    """
    if impl in ("auto", "pallas"):
        from blurred_gan_tpu.ops.blur_pallas import blur_images_pallas

        return blur_images_pallas(images, scale)
    n, h, w, c = images.shape
    resolution = max(h, w)
    t_h = blur_matrix(scale, h, resolution)
    t_w = blur_matrix(scale, w, resolution)
    x = images.astype(jnp.float32)
    # Row pass (blur along W), then column pass (blur along H); batched over N, C.
    y = jnp.einsum("nhwc,vw->nhvc", x, t_w, precision=precision)
    z = jnp.einsum("nhwc,uh->nuwc", y, t_h, precision=precision)
    return z.astype(images.dtype)


def gaussian_blur_depthwise(images, std, kernel_size: int,
                            *, precision=jax.lax.Precision.HIGHEST):
    """Reference-style separable *depthwise-conv* blur with a static kernel size.

    This is the direct analogue of /root/reference/gaussian_blur.py:91-132 (two
    ``tf.nn.depthwise_conv2d`` with SAME padding). Kept as a numerical oracle for the
    matmul path and for CPU use; the hot path is :func:`blur_images`.
    """
    n, h, w, c = images.shape
    g = gaussian_kernel_1d(std, kernel_size)
    taps = g.shape[0]
    x = images.astype(jnp.float32)
    # Depthwise conv == feature_group_count=C with an HWIO kernel of shape (kh,kw,1,C).
    k_row = jnp.tile(g.reshape(1, taps, 1, 1), (1, 1, 1, c))
    k_col = jnp.tile(g.reshape(taps, 1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, k_row.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k_row, window_strides=(1, 1), padding="SAME", dimension_numbers=dn,
        feature_group_count=c, precision=precision)
    z = jax.lax.conv_general_dilated(
        y, k_col, window_strides=(1, 1), padding="SAME", dimension_numbers=dn,
        feature_group_count=c, precision=precision)
    return z.astype(images.dtype)
