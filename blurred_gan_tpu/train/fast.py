"""Device-resident chunked training: many steps per dispatch, zero host sync.

The host-driven loop (train/loop.py) dispatches one jitted step per batch — the
right shape for huge datasets and host-side control, but each step pays a
host→device round trip (µs in production, ~1.5 ms through a dev tunnel). For
datasets that fit in HBM as uint8 (MNIST = 45 MB; CelebA-128 ≈ 9.5 GB just
fits a v5e's 16 GB next to the model; CelebA-64 ≈ 2.4 GB comfortably), the
TPU-native shape is: park the whole dataset on device once and
``lax.scan`` N train steps per dispatch, gathering each batch from the
device-resident store by an index matrix computed on host per chunk.

The σ controllers run *inside* the compiled program:

- open-loop exponential decay (callbacks.py:45-62) as the closed-form
  ``σ(n) = σ₀ · r^(n/decay_steps)`` of the carried batch counter;
- the **adaptive controller** (callbacks.py:65-135) as a jnp transition on a
  carried (std, score_ratio, last_modification, stop) tuple — exactly the
  host state machine of sched/blur.py (equivalence is tested), so the closed
  loop runs at full device rate with no one-step host lag at all.

Per-step metrics come back stacked, so the host can replay its hooks/logging
after each chunk; checkpoint/sample cadences then land on chunk boundaries.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blurred_gan_tpu.sched.blur import (
    AdaptiveBlurController,
    BlurDecayController,
)
from blurred_gan_tpu.train.state import GAN, TrainState
from blurred_gan_tpu.train.step import make_train_step


class AdaptiveState(NamedTuple):
    """Device-side mirror of sched.blur.AdaptiveBlurState."""

    std: jnp.ndarray
    score_ratio: jnp.ndarray
    last_modification_batch: jnp.ndarray
    stop_training: jnp.ndarray

    @classmethod
    def init(cls, controller: AdaptiveBlurController) -> "AdaptiveState":
        return cls(jnp.float32(controller.max_value), jnp.float32(0.5),
                   jnp.int32(0), jnp.bool_(False))


def adaptive_update(controller: AdaptiveBlurController, ada: AdaptiveState,
                    batch: jnp.ndarray, fake_scores, real_scores
                    ) -> AdaptiveState:
    """jnp transition identical to AdaptiveBlurController.update (the host
    version's semantics, callbacks.py:112-135), usable inside scan."""
    c = controller
    denom = real_scores + fake_scores
    ratio = jnp.where(denom == 0.0, 0.5, fake_scores / denom)
    smoothed = c.smoothing * ada.score_ratio + (1 - c.smoothing) * ratio

    warm = batch >= c.warmup_n_batches
    stable = ((smoothed >= 0.5 - c.threshold)
              & (smoothed <= 0.5 + c.threshold))
    not_recent = (batch - ada.last_modification_batch
                  >= c.delay_between_modifications)
    modify = warm & stable & not_recent
    std = jnp.where(modify & c.apply_changes, c.smoothing * ada.std, ada.std)
    last_mod = jnp.where(modify, batch, ada.last_modification_batch)
    stop = ada.stop_training | (std < c.min_value)
    return AdaptiveState(std, smoothed, last_mod, stop)


def make_chunked_train_fn(gan: GAN, hparams, chunk_steps: int,
                          mesh: Optional[Mesh] = None,
                          blur_controller: Optional[BlurDecayController] = None,
                          adaptive_controller: Optional[
                              AdaptiveBlurController] = None,
                          state_shardings=None):
    """Build ``chunk(state, ada, data_u8, idx, rng) -> (state, ada, metrics,
    packed)``.

    ``data_u8``: the full uint8 NHWC dataset, device-resident. ``idx``: an
    int32 (chunk_steps, global_batch) index matrix (this chunk's shuffled
    batches). Per-step σ comes from the in-program controller; ``metrics``
    leaves are stacked (chunk_steps,) arrays, and ``packed`` is the same data
    as one (chunk_steps, len(metrics)) float32 matrix with columns in
    ``sorted(metrics)`` order — fetch that one array for a single
    device→host transfer per chunk.
    """
    assert blur_controller is None or adaptive_controller is None, \
        "at most one σ controller"
    step = make_train_step(gan, hparams, mesh=None, donate_state=False)
    # mesh=None: the raw step is inlined into the scan below; sharding is
    # applied to the whole chunk program instead.

    if adaptive_controller is not None:
        def sigma_of(n_batches, ada):
            return ada.std
    elif blur_controller is not None:
        bc = blur_controller

        def sigma_of(n_batches, ada):
            sig = bc.schedule.initial_value * (
                bc.schedule.decay_rate
                ** (n_batches.astype(jnp.float32) / bc.schedule.decay_steps))
            return jnp.maximum(sig, bc.min_value)
    else:  # constant σ (non-blurred GANs pass 0)
        const = float(getattr(hparams, "initial_blur_std", 0.0))

        def sigma_of(n_batches, ada):
            return jnp.float32(const)

    def chunk(state: TrainState, ada: AdaptiveState, data_u8, idx, rng
              ) -> Tuple[TrainState, AdaptiveState, dict, jnp.ndarray]:
        def run_step(st, ad, idx_i):
            reals = jnp.take(data_u8, idx_i, axis=0)
            sigma = sigma_of(st.n_batches, ad)
            k = jax.random.fold_in(rng, st.n_batches)
            st, metrics, _ = step(st, reals, sigma, k)
            if adaptive_controller is not None:
                ad = adaptive_update(adaptive_controller, ad,
                                     st.n_batches.astype(jnp.int32),
                                     metrics["fake_scores"],
                                     metrics["real_scores"])
                metrics["blur_controller/std"] = ad.std
                metrics["blur_controller/smoothed_ratio"] = ad.score_ratio
                metrics["stop_training"] = ad.stop_training
            return st, ad, metrics

        def body(carry, idx_i):
            st, ad = carry
            if adaptive_controller is None:
                st, ad, metrics = run_step(st, ad, idx_i)
            else:
                # Once the controller raises stop_training, remaining steps of
                # the chunk are no-ops (the host loop would have stopped
                # dispatching) — keeps chunked state equal to the host loop's.
                zeros = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype),
                    jax.eval_shape(run_step, st, ad, idx_i)[2])
                st, ad, metrics = jax.lax.cond(
                    ad.stop_training,
                    lambda op: (op[0], op[1], zeros),
                    lambda op: run_step(*op),
                    (st, ad, idx_i))
            return (st, ad), metrics

        (state, ada), stacked = jax.lax.scan(body, (state, ada), idx)
        # One (chunk_steps, K) f32 matrix of every metric, key-sorted: the
        # host fetches this single array per chunk (one device->host transfer)
        # instead of one transfer per metric leaf — through a relay/tunnel
        # that's the difference between ~2 ms and ~30 ms of per-chunk
        # overhead. The dict is still returned for API/tests; its leaves cost
        # nothing unless fetched.
        packed = jnp.stack(
            [stacked[k].astype(jnp.float32) for k in sorted(stacked)], axis=1)
        return state, ada, stacked, packed

    if mesh is None:
        return jax.jit(chunk, donate_argnums=(0,))
    replicated = NamedSharding(mesh, P())
    state_sh = replicated if state_shardings is None else state_shardings
    # The dataset is replicated (this mode trades HBM for zero host traffic)
    # but the per-step index rows are sharded over the data axis, so each
    # device gathers and trains on only its shard of every batch — real DP.
    idx_sharded = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        chunk,
        in_shardings=(state_sh, replicated, replicated, idx_sharded,
                      replicated),
        out_shardings=(state_sh, replicated, replicated, replicated),
        donate_argnums=(0,),
    )


def chunk_indices(num_examples: int, batch: int, chunk_steps: int,
                  start_batch_counter: int, seed: int):
    """Host-side index matrix for one chunk, continuing the SAME epoch-seeded
    permutation stream as ArrayDataset.batches (resume-compatible). Each
    epoch's permutation is generated once, not per step."""
    import numpy as np

    assert batch <= num_examples, (
        f"global batch {batch} exceeds dataset size {num_examples}")
    steps_per_epoch = max(num_examples // batch, 1)
    out = np.empty((chunk_steps, batch), np.int32)
    perms = {}
    for i in range(chunk_steps):
        n = start_batch_counter + i
        epoch, pos = divmod(n, steps_per_epoch)
        if epoch not in perms:
            perms = {epoch: np.random.RandomState(
                seed + epoch).permutation(num_examples)}
        out[i] = perms[epoch][pos * batch:(pos + 1) * batch]
    return out
