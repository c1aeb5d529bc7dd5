"""Step-time ablation: where does the train step's wall time go?

Times scan-wrapped variants of the flagship CelebA-128 blurred WGAN-GP step
(same relay-safe methodology as bench.py: whole-scan programs, fresh input
values per timed call, block on the full output pytree):

  full        disc step (WGAN-GP, blurred) + gen step every batch
  no_gen      d_steps_per_g_step so large the gen branch never fires
  no_gp       plain WGAN critic loss (use_gp off) + gen step
  no_blur     WGAN-GP with blurred=False (sigma unused)
  gen_only    generator forward + backward + Adam only (approximated by
              no_gp/no_blur deltas; not a separate program)

The differences estimate each component's marginal cost; components overlap
(XLA fuses/overlaps), so they need not sum exactly to the full step.

    python benchmarks/step_ablation.py [--batch 32] [--resolution 128] [--steps 50]

One JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

_CALL = [0]


def time_variant(name: str, *, batch: int, resolution: int, steps: int,
                 use_gp: bool = True, blurred: bool = True,
                 gen_every: int = 1) -> dict:
    from blurred_gan_tpu import runtime
    from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       WGANHyperParameters, create_train_state,
                                       make_train_step)

    runtime.enable_fast_prng()
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    gan = GAN(celeba_generator(resolution, compute_dtype=dtype),
              celeba_discriminator(resolution, compute_dtype=dtype),
              blurred=blurred)
    if use_gp:
        hp = BlurredWGANGPHyperParameters(
            batch_size=batch, global_batch_size=batch,
            d_steps_per_g_step=gen_every)
    else:
        hp = WGANHyperParameters(batch_size=batch, global_batch_size=batch,
                                 d_steps_per_g_step=gen_every)
    state = create_train_state(gan, hp, jax.random.PRNGKey(0),
                               (resolution, resolution, 3))
    step = make_train_step(gan, hp, donate_state=False)

    def run_n(state, reals0, key):
        def body(carry, i):
            st = carry
            # Perturb the batch per iteration so no two steps see equal inputs.
            reals = reals0 + (i.astype(jnp.float32) * 1e-3)
            st, metrics, _ = step(st, reals, jnp.float32(2.5),
                                  jax.random.fold_in(key, i))
            return st, metrics["disc_loss"]

        return jax.lax.scan(body, state, jnp.arange(steps))

    run = jax.jit(run_n)

    def fresh_inputs():
        _CALL[0] += 1
        k = jax.random.PRNGKey(1000 + _CALL[0])
        reals = jax.random.uniform(
            k, (batch, resolution, resolution, 3), jnp.float32, -1.0, 1.0)
        return reals, jax.random.PRNGKey(2000 + _CALL[0])

    # Relay metrology (hard-won, see CLAUDE.md): block_until_ready can return
    # instantly for a dispatched-but-unfinished execution; fresh input
    # *values* alone don't defeat the execution cache; and fetching a SLICE
    # spawns a separate remote op that can itself be cache-served. So (a)
    # the timed call is CHAINED on the warmup's output state, and (b)
    # completion is forced by np.asarray of the full `losses` output buffer
    # of the timed execution (one ~20 ms RTT), (c) values must differ from
    # the warmup's.
    reals, key = fresh_inputs()
    state2, losses = run(state, reals, key)   # compile + warmup
    warm = np.asarray(losses)
    reals, key = fresh_inputs()
    t0 = time.perf_counter()
    st3, losses = run(state2, reals, key)
    vals = np.asarray(losses)                 # forces + awaits execution
    dt = time.perf_counter() - t0
    assert dt / steps > 1e-5, \
        f"implausible {dt / steps * 1e3:.4f} ms/step — relay cache hit?"
    assert np.isfinite(vals).all() and not np.array_equal(vals, warm), \
        "timed run returned warmup's values — relay served a stale result"

    row = {"variant": name, "batch": batch, "resolution": resolution,
           "steps": steps, "ms_per_step": round(dt / steps * 1e3, 3),
           "images_per_sec": round(steps * batch / dt, 1),
           "device": jax.default_backend()}
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()
    kw = dict(batch=args.batch, resolution=args.resolution, steps=args.steps)
    rows = {}
    rows["full"] = time_variant("full", **kw)
    rows["no_gen"] = time_variant("no_gen", gen_every=10 ** 9, **kw)
    rows["no_gp"] = time_variant("no_gp", use_gp=False, **kw)
    rows["no_blur"] = time_variant("no_blur", blurred=False, **kw)
    full = rows["full"]["ms_per_step"]
    print(json.dumps({
        "summary_ms": {
            "full": full,
            "gen_step_marginal": round(full - rows["no_gen"]["ms_per_step"], 3),
            "gp_marginal": round(full - rows["no_gp"]["ms_per_step"], 3),
            "blur_marginal": round(full - rows["no_blur"]["ms_per_step"], 3),
        }}, ))


if __name__ == "__main__":
    main()
