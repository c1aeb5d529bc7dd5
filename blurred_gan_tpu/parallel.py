"""Device-mesh construction and parameter partitioning (DP × TP × FSDP).

The reference's only parallelism ambition was mirrored data parallelism
(tf.distribute stubs, /root/reference/wgan.py:84, demo_mnist.py:116-123). Here
the data axis is first-class (train/step.py shards the batch over ``"data"``),
and this module adds the scale-up axes the reference never had:

- **tensor parallelism** over a ``"model"`` mesh axis for the conv/dense
  output-feature dimensions — useful once generators outgrow one chip's HBM
  (e.g. 256²+ DCGANs or wider variants);
- **FSDP (ZeRO-3-style) parameter sharding** over the ``"data"`` axis
  (``state_shardings(..., fsdp=True)``): large kernels' *input*-feature axis
  is split across the data shards, and because the optimizer moments mirror
  parameter shapes they shard identically — per-device parameter + optimizer
  memory drops by ~n_data at the cost of a per-layer weight all-gather.

The TPU-native mechanism is GSPMD: we only annotate *parameter* shardings;
XLA propagates them through the forward, both backward passes (including the
WGAN-GP grad-of-grad) and the optimizer update, inserting all-gathers /
reduce-scatters on ICI where needed. No per-layer communication code exists
anywhere — exactly the "annotate and let the partitioner work" recipe.

Numerics are unchanged by construction (same math, different layout), which
``tests/test_parallel.py`` verifies against the single-device step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. Defaults to all devices × pure DP.

    The data axis should map to the slower/outer physical axis only when the
    model axis carries the heavier traffic (TP all-gathers are per-layer; DP
    gradient reductions are per-step) — with devices listed in ICI order,
    keeping ``model`` innermost (fastest-varying) does that.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    assert len(devices) >= need, (n_data, n_model, len(devices))
    arr = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _leaf_spec(x, n_model: int, min_size: int, n_data: int = 1,
               fsdp_min_size: Optional[int] = None) -> P:
    shape = getattr(x, "shape", ())
    spec = [None] * len(shape)
    if (len(shape) >= 2 and n_model > 1
            and shape[-1] % n_model == 0
            and int(np.prod(shape)) >= min_size):
        spec[-1] = "model"
    if (fsdp_min_size is not None and len(shape) >= 2 and n_data > 1
            and shape[-2] % n_data == 0
            and int(np.prod(shape)) >= fsdp_min_size):
        # Input-feature axis: conv kernels (H, W, I, O) and dense kernels
        # (I, O) both put it second-to-last, so it composes with the TP
        # split on O.
        spec[-2] = "data"
    if not any(spec):
        return P()
    return P(*spec)


def state_shardings(state, mesh: Mesh, min_size: int = 2 ** 12,
                    fsdp: bool = False, fsdp_min_size: int = 2 ** 14):
    """NamedSharding pytree for a TrainState under a (data, model) mesh.

    Rule: any ≥2-D leaf whose last (output-feature) axis divides the model
    axis gets that axis sharded — conv kernels (H, W, I, O) and dense kernels
    (I, O) split over O, so each model shard owns a feature slice. Everything
    else (biases, BN stats, counters, Adam scalars) replicates. Optimizer
    moments follow automatically because they mirror parameter shapes.

    ``fsdp=True`` additionally shards leaves of ≥ ``fsdp_min_size`` elements
    over the ``data`` axis on their *input*-feature (second-to-last)
    dimension — ZeRO-3-style: per-device parameter AND optimizer-moment
    memory drops by ~n_data, paid for with a per-layer weight all-gather
    that XLA schedules on ICI. Small leaves stay replicated (the gather
    latency would exceed the memory win).
    """
    n_model = mesh.shape.get("model", 1)
    n_data = mesh.shape.get("data", 1)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(
            x, n_model, min_size,
            n_data=n_data, fsdp_min_size=fsdp_min_size if fsdp else None)),
        state)
