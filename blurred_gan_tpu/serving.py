"""Serving export: freeze a trained generator into a portable StableHLO
artifact (`jax.export`) that runs without this framework, flax, or the
checkpoint — the deployment-side counterpart of the reference's
``save_weights`` split (/root/reference/wgan.py:229-231), redesigned for the
XLA serving story: one ahead-of-time-lowered program with the weights baked
in as constants, a *symbolic* batch dimension (any batch size at serve time,
one artifact), and multi-platform lowering (a single file can carry tpu +
cpu lowerings).

    from blurred_gan_tpu.serving import export_generator, load_generator
    blob = export_generator(gan, state)            # bytes
    serve = load_generator(blob)                   # callable
    images = serve(latents)                        # any batch size

The artifact is consumed with ``jax.export.deserialize`` — i.e. any JAX
process (no blurred_gan_tpu import) can serve it; non-JAX runtimes can feed
the embedded StableHLO module (``mlir_module()``) to their own XLA/PJRT
loader.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_generator(gan, state, *, use_ema: bool = False,
                     platforms: Optional[Sequence[str]] = None,
                     batch_dim: str = "b") -> bytes:
    """Serialize ``z -> images`` with the generator weights baked in.

    - ``use_ema``: bake the EMA weights (``state.g_ema``) instead of the live
      ones (requires a run trained with ``ema_decay > 0``).
    - ``platforms``: lowering targets, e.g. ``("tpu", "cpu")``; default = the
      current default backend only. A multi-platform artifact picks the
      matching lowering at call time.
    - ``batch_dim``: name of the symbolic batch dimension; the exported
      program accepts ``(B, latent_size)`` for ANY B ≥ 1 — batch size is a
      serve-time choice, not an export-time one (the TPU-friendly
      alternative to exporting one program per batch size).
    """
    params = state.g_ema if use_ema else state.g_params
    if use_ema and not jax.tree_util.tree_leaves(state.g_ema):
        raise ValueError("use_ema=True but the state has no EMA weights "
                         "(train with ema_decay > 0)")
    stats = state.g_stats

    def generate(z):
        images, _ = gan.generate(params, stats, z, train=False)
        return images

    (b,) = jexport.symbolic_shape(batch_dim)
    z_spec = jax.ShapeDtypeStruct((b, gan.latent_size), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(generate), **kwargs)(z_spec)
    return bytes(exported.serialize())  # serialize() hands back a bytearray


def load_generator(blob_or_path) -> Callable:
    """Deserialize an exported generator into ``serve(latents) -> images``.

    Accepts the raw bytes or a file path. The returned callable is jitted
    (the exported program re-stages into the current backend's executable
    on first call per batch size).
    """
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jexport.deserialize(blob)
    call = jax.jit(exported.call)

    def serve(latents):
        return call(jnp.asarray(latents, jnp.float32))

    serve.exported = exported  # introspection: .in_avals, .platforms, ...
    return serve
