"""Benchmark: blurred WGAN-GP training throughput on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state images/sec of the full jitted train step (disc update with
gradient-penalty double-backward + generator update + Gaussian blur ×4) at
CelebA-128 scale on whatever accelerator is attached (one TPU chip under the
driver; CPU elsewhere, with a smaller config so it finishes).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is the measured throughput of the reference's own architecture run via
its framework contemporary equivalent is unavailable here; until a reference GPU
run is recorded in BASELINE.md we report vs_baseline=1.0 at parity definition
(value / itself) is meaningless — instead we use the north-star target denominator
recorded in BASELINE_DENOM (images/sec) when present, else null.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Measured reference-framework throughput (images/sec) to divide by, once
# recorded (see BASELINE.md "to be measured"). None until then.
BASELINE_DENOM = None


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        resolution, batch, steps = 128, 32, 30
    else:  # CPU smoke: tiny but same code path
        resolution, batch, steps = 32, 8, 5

    from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       create_train_state, make_train_step)

    hp = BlurredWGANGPHyperParameters(batch_size=batch,
                                      global_batch_size=batch)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    gan = GAN(celeba_generator(resolution, compute_dtype=dtype),
              celeba_discriminator(resolution, compute_dtype=dtype),
              blurred=True)
    state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                               (resolution, resolution, 3))
    step = make_train_step(gan, hp, donate_state=False)

    rng = jax.random.PRNGKey(1)
    reals = jax.random.uniform(rng, (batch, resolution, resolution, 3),
                               jnp.float32, -1.0, 1.0)

    # warmup/compile
    state2, metrics, _ = step(state, reals, jnp.float32(2.5),
                              jax.random.fold_in(rng, 0))
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state2, metrics, _ = step(state2, reals, jnp.float32(2.5 * 0.999 ** i),
                                  jax.random.fold_in(rng, i + 1))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    images_per_sec = steps * batch / dt
    out = {
        "metric": f"train_images_per_sec_celeba{resolution}_wgangp_blur",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": (round(images_per_sec / BASELINE_DENOM, 3)
                        if BASELINE_DENOM else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
