"""A/B microbenchmark: Pallas fused blur kernel vs the einsum/XLA lowering
(SURVEY.md §7 step 9; VERDICT.md round-1 next #9).

Relay metrology (CLAUDE.md) learned the hard way: the relay serves repeat
executions of the SAME compiled program with the SAME argument values
quasi-instantly, and the cache key is the program hash — two Python functions
that trace to identical HLO count as one program. So here (a) the einsum arm
forces ``impl="einsum"`` (a structurally different program from the
primitive's Pallas arm), (b) every timed call uses fresh input values, and
(c) the iteration count is auto-calibrated per arm until a timed run costs
at least ``--min-seconds`` of wall clock, far above the ~1 ms dispatch floor.

Note the step-level A/B (``bench.py --blur_impl``) is the number that matters
for training: inside the full step XLA fuses/overlaps the blur with adjacent
work, which a standalone scan cannot show.

    python benchmarks/blur_ab.py [--resolutions 128,256] [--batch 32]

One JSON line per (impl, resolution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

from blurred_gan_tpu.ops.blur import blur_images
from blurred_gan_tpu.ops.blur_pallas import blur_images_pallas

_RUN_COUNTER = [0]


def _timed_run(fn, x, iters: int) -> float:
    """Wall seconds for ``iters`` chained blurs, fresh inputs every call."""

    @jax.jit
    def run(x, sig0):
        def body(carry, i):
            y = fn(carry, sig0 * (0.999 ** i.astype(jnp.float32)))
            return y, ()

        out, _ = jax.lax.scan(body, x, jnp.arange(iters))
        # A tiny probe computed INSIDE the timed program: fetching it awaits
        # this execution (fetching a post-hoc slice spawns a separate remote
        # op the relay can cache-serve; CLAUDE.md).
        return out, jnp.mean(out)

    import numpy as np

    _RUN_COUNTER[0] += 1
    jitter = 1.0 + 1e-4 * _RUN_COUNTER[0]
    out, probe = run(x * jitter, jnp.float32(2.5 * jitter))  # compile + warmup
    warm = float(np.asarray(probe))
    _RUN_COUNTER[0] += 1
    jitter = 1.0 + 1e-4 * _RUN_COUNTER[0]
    t0 = time.perf_counter()
    # Relay metrology (CLAUDE.md): CHAIN the timed call on the warmup's
    # output (fresh uploaded values alone do not defeat the execution cache)
    # and force+await completion by fetching the probe — an output buffer of
    # THE timed execution itself. One ~RTT; calibrate iters to dwarf it.
    out, probe = run(out, jnp.float32(2.5 * jitter))
    v = float(np.asarray(probe))
    dt = time.perf_counter() - t0
    assert dt / iters > 1e-7, \
        f"implausible {dt / iters * 1e6:.3f} us/blur — relay cache hit?"
    assert np.isfinite(v) and v != warm, \
        "timed run returned warmup's probe — relay served a stale result"
    return dt


def time_impl(fn, name: str, resolution: int, batch: int,
              min_seconds: float) -> dict:
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch, resolution, resolution, 3), jnp.float32,
                           -1.0, 1.0)
    iters = 50
    dt = _timed_run(fn, x, iters)
    while dt < min_seconds and iters < 200_000:
        # Scale the scan length (recompile) until the run dwarfs dispatch.
        iters = int(iters * max(2.0, 1.3 * min_seconds / max(dt, 1e-4)))
        dt = _timed_run(fn, x, iters)

    planes = batch * 3
    flops = 2 * planes * (resolution ** 3) * 2
    row = {
        "impl": name,
        "resolution": resolution,
        "batch": batch,
        "iters": iters,
        "us_per_blur": round(dt / iters * 1e6, 2),
        "gflops": round(flops / (dt / iters) / 1e9, 1),
        "device": jax.default_backend(),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolutions", type=str, default="128,256")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--min-seconds", type=float, default=0.5)
    args = p.parse_args()
    for res in (int(r) for r in args.resolutions.split(",")):
        for name, fn in (("einsum", partial(blur_images, impl="einsum")),
                         ("pallas", blur_images_pallas)):
            time_impl(fn, name, res, args.batch, args.min_seconds)


if __name__ == "__main__":
    main()
