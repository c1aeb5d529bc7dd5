"""Pure-functional train state (replaces the reference's mutable Keras model).

The reference keeps everything as mutable attributes on a ``tf.keras.Model``
(wgan.py:46-84): two optimizers, G/D weights, BN statistics, and the progress
counters ``n_img``/``n_batches`` (wgan.py:70-71) that the checkpoint captures. Here
the same state is one immutable pytree threaded through a jitted step — and the blur
sigma is a *step input*, not state, so the host scheduler can move it every batch
without touching device state (SURVEY.md §5.2's race note).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from blurred_gan_tpu.ops.blur import blur_images


# ---------------------------------------------------------------------------
# Overflow-safe example counter
# ---------------------------------------------------------------------------
#
# JAX without x64 silently downcasts int64 to int32, so a scalar ``n_img``
# would wrap at 2.15e9 images — ~54 h at the measured v5e rate (BASELINE.md),
# corrupting the global step of a flagship-scale run. ``n_img`` is therefore a
# (2,)-int32 [hi, lo] pair in base 2**30: exact far past 2**60 images.
# ``n_batches`` stays a scalar int32 — it counts *steps* (wrap needs 2**31
# steps ≈ 2.7e11 images at batch 128) and is consumed by scalar ops
# (% d_steps_per_g_step, fold_in — whose uint32 data wraps at 2**32 anyway).

_COUNTER_RADIX = 1 << 30


def wide_counter(value: int = 0) -> jnp.ndarray:
    """Encode a python int as the (2,)-int32 [hi, lo] device counter."""
    return jnp.array([value >> 30, value & (_COUNTER_RADIX - 1)], jnp.int32)


def wide_add(counter, k):
    """counter + k for 0 <= k < 2**30 (any batch size), overflow-free:
    lo < 2**30 and k < 2**30, so lo + k < 2**31 stays inside int32."""
    lo = counter[1] + k
    return jnp.stack([counter[0] + lo // _COUNTER_RADIX,
                      lo % _COUNTER_RADIX])


def wide_value(counter) -> int:
    """Decode a [hi, lo] counter to a python int (host-side)."""
    hi, lo = np.asarray(counter)
    return (int(hi) << 30) + int(lo)


@dataclass(frozen=True)
class GAN:
    """Static definition of a GAN: the two networks + the blur composition flag.

    ``blurred=True`` composes the Gaussian blur in front of the critic exactly like
    the reference's ``BlurredVariant`` factory (blurred_gan.py:17-49): reals, fakes
    and the GP interpolates all pass through the blur, whose sigma is fed per step.
    """

    generator: nn.Module
    discriminator: nn.Module
    latent_size: int = 100
    blurred: bool = True
    remat_critic: bool = False  # rematerialise D in the GP double-backward
    blur_impl: str = "auto"     # "auto"/"pallas" (fused primitive) | "einsum"

    def sample_latents(self, rng, batch: int):
        """Uniform [0, 1) latents (wgan.py:116-118)."""
        return jax.random.uniform(rng, (batch, self.latent_size), jnp.float32)

    def generate(self, g_params, g_stats, z, *, train: bool):
        variables = {"params": g_params, "batch_stats": g_stats}
        if train:
            return self.generator.apply(variables, z, train=True,
                                        mutable=["batch_stats"])
        return self.generator.apply(variables, z, train=False), {"batch_stats": g_stats}

    def critic(self, d_params, images, sigma, *, train: bool, rng=None):
        """Blur (if configured) then score. ``train`` toggles dropout."""
        x = (blur_images(images, sigma, impl=self.blur_impl)
             if self.blurred else images)

        def apply_fn(p, xx, r):
            # `train` is closed over (static) so jax.checkpoint never traces
            # it; only params/images/rng are rematerialization inputs.
            if train:
                return self.discriminator.apply({"params": p}, xx, train=True,
                                                rngs={"dropout": r})
            return self.discriminator.apply({"params": p}, xx, train=False)

        if self.remat_critic:
            apply_fn = jax.checkpoint(apply_fn)
        return apply_fn(d_params, x, rng)


class TrainState(flax.struct.PyTreeNode):
    """Everything the checkpoint must capture (SURVEY.md §5.4)."""

    g_params: Any
    g_stats: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    # Images seen — the global step (wgan.py:100). A (2,)-int32 [hi, lo]
    # wide counter (base 2**30); decode with ``wide_value``.
    n_img: jnp.ndarray
    n_batches: jnp.ndarray   # scalar int32 step counter
    # EMA of g_params (hparams.ema_decay > 0); () = disabled, so the default
    # pytree has no extra leaves and old checkpoints stay structure-compatible.
    g_ema: Any = ()


def make_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    """Optimizer factory for the hparams ``optimizer`` string (wgan.py:56-61).

    Adam epsilon 1e-7 matches tf.keras defaults.
    """
    name = name.lower()
    if name == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate)
    raise ValueError(f"unknown optimizer '{name}'")


def create_train_state(gan: GAN, hparams, rng, image_shape) -> TrainState:
    """Initialise parameters, BN stats and both optimizer states.

    ``image_shape`` is (H, W, C) of the training images.
    """
    g_rng, d_rng = jax.random.split(rng)
    z = jnp.zeros((1, gan.latent_size), jnp.float32)
    g_vars = gan.generator.init(g_rng, z, train=False)
    x = jnp.zeros((1, *image_shape), jnp.float32)
    d_vars = gan.discriminator.init(d_rng, x, train=False)

    opt = make_optimizer(hparams.optimizer, hparams.learning_rate)
    g_opt = make_optimizer(
        hparams.optimizer,
        float(getattr(hparams, "g_learning_rate", 0.0) or 0.0)
        or hparams.learning_rate)
    g_params = g_vars["params"]
    g_stats = g_vars.get("batch_stats", {})
    d_params = d_vars["params"]
    use_ema = float(getattr(hparams, "ema_decay", 0.0) or 0.0) > 0.0
    return TrainState(
        g_params=g_params,
        g_stats=g_stats,
        d_params=d_params,
        g_opt_state=g_opt.init(g_params),
        d_opt_state=opt.init(d_params),
        n_img=wide_counter(0),
        n_batches=jnp.zeros((), jnp.int32),
        # EMA starts AT the initial weights (the usual convention: a biased
        # warm start converges to the trailing average as steps accumulate).
        # jnp.copy, not aliasing: the step donates the state, and two state
        # leaves sharing one buffer is a double-donation error.
        g_ema=(jax.tree_util.tree_map(jnp.copy, g_params) if use_ema else ()),
    )


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
