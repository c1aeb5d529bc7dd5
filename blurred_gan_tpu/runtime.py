"""Runtime configuration helpers for TPU deployments."""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> int:
    """Multi-host bring-up (SURVEY.md §5.8): call ``jax.distributed
    .initialize()`` when a coordinator is configured, else no-op.

    Same program, no code change — after this, ``jax.devices()`` spans the
    slice and the data-parallel mesh in the demos covers every chip. Returns
    the process count. Triggers on the standard coordinator env var
    (``JAX_COORDINATOR_ADDRESS``, set by TPU pod launchers) or an explicit
    ``BLURRED_GAN_MULTIHOST=1``.
    """
    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("BLURRED_GAN_MULTIHOST") == "1"):
        jax.distributed.initialize()
    return jax.process_count()


def enable_fast_prng() -> None:
    """Switch JAX's default PRNG to the hardware ``rbg`` generator.

    The default threefry2x32 generator is counter-based crypto-ish and costs
    real VPU time for the per-element dropout masks and latent draws inside
    the train step — measured on v5e at CelebA-128 WGAN-GP: 3,695 → 4,123
    images/sec/chip (+12%) from this switch alone. ``rbg`` uses the TPU's
    hardware RNG instructions; streams are still keyed/splittable.

    Call before any PRNGKey is created (entry points do). Note: resuming a
    run trained under one impl with the other changes the RNG stream — keep
    it consistent per run (the framework's own entry points always enable
    this, so checkpoints they produce are consistent).
    """
    jax.config.update("jax_default_prng_impl", "rbg")
