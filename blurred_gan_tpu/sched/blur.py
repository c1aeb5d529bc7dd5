"""Blur-σ schedulers — the novel control loop of the blurred-GAN recipe.

Capability parity with the reference's controllers (/root/reference/callbacks.py:45-135)
redesigned for an async-dispatch TPU loop: both controllers here are **pure host-side
state machines**. σ is a *step input* to the jitted train step, never device state, so
the host can move it every batch without a host→device variable write and without
racing in-flight steps (SURVEY.md §5.2). The adaptive controller is deliberately
one-step-lagged: σ for step N is a deterministic function of metrics from steps ≤ N-1,
which keeps the device step pure and the pipeline unstalled.

Two controllers, as in the reference:

- :class:`BlurDecayController` — open-loop exponential decay evaluated at the batch
  counter (callbacks.py:45-62).
- :class:`AdaptiveBlurController` — closed-loop: EMA of the discriminator's
  fake/(real+fake) score ratio; when the ratio sits inside ``0.5 ± threshold`` the
  problem is "too easy" and σ is decayed, rate-limited to once per
  ``delay_between_modifications`` batches after a warmup; training stops when σ falls
  below ``min_value`` (callbacks.py:65-135). The reference left the actual σ
  assignment commented out (callbacks.py:103 — it only logged ``would_modify``); here
  the adaptive path is real, with an ``apply_changes=False`` escape hatch to
  reproduce the reference's log-only behaviour.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, replace
from typing import Dict, Tuple


@dataclass(frozen=True)
class ExponentialDecaySchedule:
    """``value(step) = initial * rate^(step / decay_steps)``.

    Continuous (non-staircase) variant, matching
    ``tf.keras.optimizers.schedules.ExponentialDecay`` as configured at
    callbacks.py:51-57. Pure function of the step — safe to call from anywhere.
    """

    initial_value: float
    decay_steps: float
    decay_rate: float = 0.96
    staircase: bool = False

    def __call__(self, step) -> float:
        p = float(step) / float(self.decay_steps)
        if self.staircase:
            p = float(int(p))
        return self.initial_value * (self.decay_rate ** p)


@dataclass
class BlurDecayController:
    """Open-loop σ schedule evaluated at the batch counter (callbacks.py:45-62).

    The reference builds ``ExponentialDecay(max_value, decay_steps=total_examples/10,
    rate=0.96)`` and evaluates it at ``model.n_batches`` every ``on_batch_begin`` —
    note the examples/batches unit mismatch is the reference's own behaviour and is
    preserved (σ decays per *batch* with a period derived from *examples*).
    ``min_value`` floors the schedule (the reference accepts but ignores it; flooring
    is the obviously-intended behaviour and changes nothing until deep in training).
    """

    total_n_training_examples: int
    max_value: float = 23.5
    min_value: float = 0.01

    def __post_init__(self):
        self.schedule = ExponentialDecaySchedule(
            initial_value=float(self.max_value),
            decay_steps=self.total_n_training_examples / 10,
            decay_rate=0.96,
        )

    def sigma(self, n_batches) -> float:
        """σ to feed the train step whose pre-step batch counter is ``n_batches``."""
        return max(self.schedule(n_batches), self.min_value)


@dataclass(frozen=True)
class AdaptiveBlurState:
    """Immutable controller state threaded by the host loop (checkpointable)."""

    std: float
    score_ratio: float = 0.5
    last_modification_batch: int = 0
    stop_training: bool = False


@dataclass(frozen=True)
class AdaptiveBlurController:
    """Closed-loop σ controller (callbacks.py:65-135), as a pure transition function.

    Per batch: ``ratio = fake/(real+fake)`` from that batch's mean scores;
    ``score_ratio ← smoothing*score_ratio + (1-smoothing)*ratio``. After
    ``warmup_n_batches``, if the smoothed ratio is within ``0.5 ± threshold`` the
    discriminator isn't discriminating (task too easy), so σ is multiplied by
    ``smoothing`` — at most once every ``delay_between_modifications`` batches
    (the reference reuses its EMA coefficient as the decay factor,
    callbacks.py:100). When σ < ``min_value`` the state's ``stop_training`` flag is
    raised (callbacks.py:133-135).
    """

    smoothing: float = 0.99
    warmup_n_batches: int = 100
    threshold: float = 0.05
    min_value: float = 0.01
    max_value: float = 23.5
    delay_between_modifications: int = 100
    apply_changes: bool = True  # False reproduces the reference's log-only mode

    def init(self) -> AdaptiveBlurState:
        return AdaptiveBlurState(std=float(self.max_value))

    def problem_is_stable(self, score_ratio: float) -> bool:
        return (0.5 - self.threshold) <= score_ratio <= (0.5 + self.threshold)

    def update(
        self, state: AdaptiveBlurState, batch: int,
        fake_scores: float, real_scores: float,
    ) -> Tuple[AdaptiveBlurState, Dict[str, float]]:
        """One transition. ``fake_scores``/``real_scores`` are the batch means from
        the step that just finished; the returned ``state.std`` is the σ for the
        *next* step (one-step-lagged feedback)."""
        fake_scores = float(fake_scores)
        real_scores = float(real_scores)
        denom = real_scores + fake_scores
        ratio = fake_scores / denom if denom != 0.0 else 0.5
        smoothed = self.smoothing * state.score_ratio + (1 - self.smoothing) * ratio
        state = replace(state, score_ratio=smoothed)

        telemetry = {
            "blur_controller/ratio": ratio,
            "blur_controller/smoothed_ratio": smoothed,
        }
        if batch < self.warmup_n_batches:
            return state, telemetry

        stable = self.problem_is_stable(smoothed)
        telemetry["blur_controller/stable"] = float(stable)
        if stable:
            recently_modified = (
                batch - state.last_modification_batch
                < self.delay_between_modifications
            )
            if not recently_modified:
                new_std = self.smoothing * state.std
                telemetry["blur_controller/would_modify"] = 1.0
                state = replace(
                    state,
                    std=new_std if self.apply_changes else state.std,
                    last_modification_batch=batch,
                )
            else:
                telemetry["blur_controller/would_modify"] = 0.0

        if state.std < self.min_value:
            state = replace(state, stop_training=True)
        telemetry["blur_controller/std"] = state.std
        return state, telemetry

    # -- checkpointing helpers (the controller state must resume with the run) -----

    @staticmethod
    def state_to_dict(state: AdaptiveBlurState) -> Dict:
        return dataclasses.asdict(state)

    @staticmethod
    def state_from_dict(d: Dict) -> AdaptiveBlurState:
        return AdaptiveBlurState(**d)
