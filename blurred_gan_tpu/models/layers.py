"""Reusable flax layers: the standalone Gaussian-blur module.

Capability parity with the reference's ``GaussianBlur2D`` Keras layer
(/root/reference/gaussian_blur.py:135-148), which owns a non-trainable σ
variable mutated by callbacks at runtime. In functional JAX, mutating layer
state from a host loop is an anti-pattern (it would force a device sync and race
async dispatch — SURVEY.md §5.2), so σ enters through the *call*: either as an
explicit argument or from a flax variable collection the caller overrides per
step (``module.apply(vars, x, sigma)``).

The framework's own training path composes the blur functionally
(``train/state.py:GAN.critic``); this module exists for users assembling their
own flax models who want the blur as a layer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from blurred_gan_tpu.ops.blur import blur_images


class GaussianBlur(nn.Module):
    """Separable Gaussian blur layer with a runtime σ.

    ``sigma`` argument wins; otherwise the non-trainable ``blur_std`` variable
    (collection "blur", initialised to ``initial_std``) is used — callers can
    swap it per apply without recompilation since it is a traced scalar:

        y = GaussianBlur(initial_std=2.0).apply(
                {"blur": {"blur_std": jnp.float32(0.7)}}, x)
    """

    initial_std: float = 0.05
    impl: str = "auto"  # "auto" | "pallas" | "einsum"

    @nn.compact
    def __call__(self, x, sigma=None):
        std_var = self.variable(
            "blur", "blur_std",
            lambda: jnp.asarray(self.initial_std, jnp.float32))
        s = std_var.value if sigma is None else jnp.asarray(sigma, jnp.float32)
        return blur_images(x, s, impl=self.impl)
