"""Benchmark: blurred WGAN-GP training throughput on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state images/sec of the full jitted train step (disc update with
gradient-penalty double-backward + generator update + Gaussian blur ×4) at
CelebA-128 scale on whatever accelerator is attached (one TPU chip under the
driver; CPU elsewhere, with a smaller config so it finishes).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is the reference's *measured* throughput on the same config
(CelebA-128 blurred WGAN-GP, batch 32), produced by running the reference itself
via ``benchmarks/reference_baseline.py`` on the best hardware available to it in
this container (TF 2.21 + oneDNN on CPU; there is no GPU here and TF cannot use
this TPU): 8.17 images/sec. On CPU (smoke config) the ratio is reported against
the reference's MNIST CPU number instead of faking comparability.
"""

from __future__ import annotations

import json
import os
import time

# Persistent compilation cache: the scanned train step is a multi-minute
# compile through the remote-compile tunnel; cache hits make re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

from blurred_gan_tpu.runtime import enable_fast_prng

enable_fast_prng()
import jax.numpy as jnp

# Measured via benchmarks/reference_baseline.py (2026-08-16, this container):
# reference TF CelebA-128 b32 on CPU. See BASELINE.md.
BASELINE_DENOM = 8.17


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=None,
                   help="override batch size (default 32, the reference's; "
                        "b128 peaks at ~11.1k img/s on v5e — see BASELINE.md)")
    p.add_argument("--resolution", type=int, default=None,
                   help="override image resolution (default 128, the "
                        "flagship config; 256 probes the headroom axis)")
    p.add_argument("--blur_impl", type=str, default="auto",
                   choices=["auto", "pallas", "einsum"],
                   help="blur lowering inside the critic: the fused Pallas "
                        "primitive (auto/pallas) or the plain-XLA einsum "
                        "baseline — step-level A/B (ops/blur.py)")
    args = p.parse_args()

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        resolution, batch, steps = args.resolution or 128, args.batch or 32, 50
    else:  # CPU smoke: tiny but same code path
        resolution, batch, steps = args.resolution or 32, args.batch or 8, 3

    from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       create_train_state, make_train_step)

    hp = BlurredWGANGPHyperParameters(batch_size=batch,
                                      global_batch_size=batch)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    gan = GAN(celeba_generator(resolution, compute_dtype=dtype),
              celeba_discriminator(resolution, compute_dtype=dtype),
              blurred=True, blur_impl=args.blur_impl)
    state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                               (resolution, resolution, 3))
    step = make_train_step(gan, hp, donate_state=False)

    rng = jax.random.PRNGKey(1)
    reals = jax.random.uniform(rng, (batch, resolution, resolution, 3),
                               jnp.float32, -1.0, 1.0)

    # Scan `steps` full train steps inside ONE compiled program so host→device
    # dispatch latency (large through the dev tunnel) doesn't pollute the
    # measurement — this times pure device throughput, the number that matters
    # at scale.
    @jax.jit
    def run(state, reals):
        def body(carry, i):
            st = carry
            sigma = 2.5 * (0.999 ** i.astype(jnp.float32))
            st, metrics, _ = step(st, reals, sigma, jax.random.fold_in(rng, i))
            return st, metrics["disc_loss"]

        return jax.lax.scan(body, state, jnp.arange(steps))

    # Measurement rules (CLAUDE.md): block on the FULL output pytree, and the
    # timed call must use different inputs from the warmup — remote runtimes
    # may serve a repeat execution with identical arguments from cache.
    state2, losses = run(state, reals)  # compile + warmup
    jax.block_until_ready((state2, losses))
    reals2 = reals * jnp.float32(0.999)
    t0 = time.perf_counter()
    state3, losses = run(state2, reals2)
    jax.block_until_ready((state3, losses))
    dt = time.perf_counter() - t0

    images_per_sec = steps * batch / dt
    ms_per_step = dt / steps * 1e3

    # MFU: XLA's own flop count for ONE bare train step (cost analysis of a
    # scanned program reports the loop body once, ignoring the trip count —
    # measured: the 50-step scan and the bare step both report 128.26 GF at
    # b32/128²) / measured step time / chip peak. v5e peak is 197 TFLOP/s
    # bf16 (the step's matmul dtype on TPU); MFU is TPU-only.
    flops_per_step = mfu = None
    try:
        cost = jax.jit(step).lower(
            state2, reals2, jnp.float32(2.5),
            jax.random.PRNGKey(3)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
        if flops_per_step and on_tpu:
            peak = 197e12  # TPU v5e bf16 peak FLOP/s
            mfu = (flops_per_step / (dt / steps)) / peak
    except Exception:
        pass  # cost analysis is backend-dependent; throughput still stands

    denom = BASELINE_DENOM if on_tpu else None  # CPU smoke isn't the config
    out = {
        "metric": f"train_images_per_sec_celeba{resolution}_wgangp_blur",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": (round(images_per_sec / denom, 3) if denom else None),
        "ms_per_step": round(ms_per_step, 3),
        "batch": batch,
        "flops_per_step": (round(flops_per_step) if flops_per_step else None),
        "mfu_vs_bf16_peak": (round(mfu, 4) if mfu else None),
    }
    if args.blur_impl != "auto":
        out["blur_impl"] = args.blur_impl
    print(json.dumps(out))


if __name__ == "__main__":
    main()
