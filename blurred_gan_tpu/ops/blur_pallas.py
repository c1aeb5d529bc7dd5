"""Fused Pallas TPU kernel for the separable Gaussian blur, as a JAX primitive.

The jnp path (ops/blur.py) lowers to two XLA matmul fusions with the intermediate
``T_h @ X`` round-tripping through HBM. This kernel fuses both banded matmuls into
one ``pallas_call`` per image plane: the plane is DMA'd HBM→VMEM once, both MXU
matmuls run back-to-back out of VMEM, and only the final result is written back —
halving HBM traffic for the op that runs 4× per training step (reference call
stack: /root/reference/wgan.py:132-172 via gaussian_blur.py:116,124).

Why a *primitive* and not ``jax.custom_vjp``: the WGAN-GP penalty differentiates
the critic's input gradient a second time (grad-of-grad, wgan.py:234-246), and
``custom_vjp`` supports only first-order reverse mode. The blur is **linear** in
the image, so a primitive with a product-rule JVP and a transpose rule gives
correct derivatives at every order: each differentiation level of the penalty
lowers to another instance of the same fused kernel (transpose of
``x ↦ T_h x T_w`` is ``ct ↦ T_hᵀ ct T_wᵀ`` — and the band matrices are exactly
symmetric, so it is again the identical blur).

σ stays a traced scalar: the band matrices are built outside the kernel (cheap
VPU work shared across all N·C planes) from
:func:`blurred_gan_tpu.ops.blur.blur_matrix`; every shape is static so the blur
schedule never recompiles (the reference's dynamic-kernel-size retrace problem,
gaussian_blur.py:65-72, solved the TPU way). σ gradients flow through the JVP's
``dT_h``/``dT_w`` terms as ordinary XLA einsums (DCE'd when unused).

Lowering is platform-split: the Pallas kernel on TPU, the einsum formulation
everywhere else — so one program works across backends (the CPU test mesh
included). At CelebA-128 each plane is a perfect 128×128 MXU tile.

Layout note: images arrive NHWC (framework-native). With C ∈ {1, 3} the channel
axis is hopeless as a lane dimension, so planes are regrouped to (N·C, H, W) —
the W axis becomes lanes, which is exactly what the row/column matmuls want.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import core
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, batching, mlir

from blurred_gan_tpu.ops.blur import blur_matrix

try:  # jax >= 0.4.31 moved Primitive to jax.extend
    from jax.extend.core import Primitive
except ImportError:  # pragma: no cover
    from jax.core import Primitive


def _blur_plane_kernel(th_ref, tw_ref, x_ref, o_ref):
    """One plane: ``o = T_h @ x @ T_w``; both matmuls on the MXU, the
    intermediate lives in VMEM only."""
    x = x_ref[0]
    y = jnp.dot(th_ref[...], x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    o_ref[0] = jnp.dot(y, tw_ref[...], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


# Per-grid-step VMEM residency of the fused kernel: t_h (H²) + t_w (W²) +
# the intermediate (H·W), plus the pipelined in/out plane blocks (2× H·W each
# for double buffering), all f32. v5e cores have ~16 MB VMEM; 512² needs
# ~7 MB (fits), 1024² ~28 MB (does not). Shapes are static at lowering time,
# so the fallback decision compiles away.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # headroom under the ~16 MB ceiling


def _kernel_vmem_bytes(h: int, w: int) -> int:
    return 4 * (h * h + w * w + h * w + 2 * (2 * h * w))


def _pallas_impl(planes, t_h, t_w):
    """planes: (P, H, W) f32; t_h: (H, H); t_w: (W, W) → (P, H, W)."""
    p, h, w = planes.shape
    if _kernel_vmem_bytes(h, w) > _VMEM_BUDGET_BYTES:
        # Beyond the VMEM ceiling (~656² for square planes: 768² already
        # needs 16.5 MB > the 12 MB budget, so it takes this fallback): let
        # XLA tile the two matmuls itself instead of overflowing the fused
        # kernel's blocks.
        return _einsum_impl(planes, t_h, t_w)
    return pl.pallas_call(
        _blur_plane_kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * (h * h * w + h * w * w),
            bytes_accessed=4 * (p * h * w * 2 + h * h + w * w),
            transcendentals=0,
        ),
    )(t_h, t_w, planes)


def _einsum_impl(planes, t_h, t_w):
    """Reference lowering for non-TPU platforms (same math, two XLA matmuls)."""
    y = jnp.einsum("hv,pvw->phw", t_h, planes,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("phw,wu->phu", y, t_w,
                      precision=jax.lax.Precision.HIGHEST)


blur_planes_p = Primitive("blur_planes")


@blur_planes_p.def_abstract_eval
def _abstract_eval(planes, t_h, t_w):
    assert planes.ndim == 3 and t_h.shape == (planes.shape[1],) * 2 \
        and t_w.shape == (planes.shape[2],) * 2
    return core.ShapedArray(planes.shape, planes.dtype)


@blur_planes_p.def_impl
def _impl(planes, t_h, t_w):
    return _einsum_impl(planes, t_h, t_w)


mlir.register_lowering(
    blur_planes_p, mlir.lower_fun(_einsum_impl, multiple_results=False))
mlir.register_lowering(
    blur_planes_p, mlir.lower_fun(_pallas_impl, multiple_results=False),
    platform="tpu")


def blur_planes(planes, t_h, t_w):
    """``out[p] = t_h @ planes[p] @ t_w`` — fused on TPU, any diff order."""
    return blur_planes_p.bind(planes, t_h, t_w)


def _jvp(primals, tangents):
    planes, t_h, t_w = primals
    dp, dth, dtw = tangents
    out = blur_planes(planes, t_h, t_w)
    parts = []
    if type(dp) is not ad.Zero:
        parts.append(blur_planes(dp, t_h, t_w))
    if type(dth) is not ad.Zero:  # σ-gradient path; plain XLA, DCE'd if unused
        parts.append(jnp.einsum("hv,pvw,wu->phu", dth, planes, t_w))
    if type(dtw) is not ad.Zero:
        parts.append(jnp.einsum("hv,pvw,wu->phu", t_h, planes, dtw))
    dout = parts[0] if parts else ad.Zero.from_primal_value(out)
    for extra in parts[1:]:
        dout = dout + extra
    return out, dout


ad.primitive_jvps[blur_planes_p] = _jvp


def _transpose(ct, planes, t_h, t_w):
    # Linear in `planes` only (t_h/t_w enter the linearized problem as
    # constants). Transpose of x ↦ A x B is ct ↦ Aᵀ ct Bᵀ.
    assert ad.is_undefined_primal(planes)
    assert not ad.is_undefined_primal(t_h) and not ad.is_undefined_primal(t_w)
    return blur_planes(ct, t_h.T, t_w.T), None, None


ad.primitive_transposes[blur_planes_p] = _transpose


def _batch(args, dims):
    planes, t_h, t_w = args
    pd, hd, wd = dims
    if hd is not batching.not_mapped or wd is not batching.not_mapped:
        # Batched band matrices: fall back to the einsum formulation.
        return jax.vmap(_einsum_impl, in_axes=dims)(planes, t_h, t_w), 0
    x = jnp.moveaxis(planes, pd, 0)
    b = x.shape[0]
    out = blur_planes(x.reshape(b * x.shape[1], *x.shape[2:]), t_h, t_w)
    return out.reshape(b, -1, *out.shape[1:]), 0


batching.primitive_batchers[blur_planes_p] = _batch


def blur_images_pallas(images, scale):
    """Gaussian-blur an NHWC batch with a traced σ — fused primitive path.

    Same band matrices and f32 accumulation as
    :func:`blurred_gan_tpu.ops.blur.blur_images`; see that docstring for the
    sizing-policy parity contract with /root/reference/gaussian_blur.py.
    """
    n, h, w, c = images.shape
    resolution = max(h, w)
    t_h = blur_matrix(scale, h, resolution)
    t_w = blur_matrix(scale, w, resolution)
    x = images.astype(jnp.float32)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h, w)
    out = blur_planes(planes, t_h, t_w)
    out = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    return out.astype(images.dtype)
