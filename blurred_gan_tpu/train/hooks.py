"""Example-count-triggered hooks for the host driver loop.

Replaces the reference's Keras-callback layer (/root/reference/callbacks.py:12-43):
``ExecuteEveryNExamplesCallback`` converts batch counts to example counts and fires
approximately every N examples with a ``starting_from`` offset. Here the same firing
rule is a small host-side object the training loop calls once per step — no Keras,
no mutable model back-pointers.

Firing rule preserved exactly (callbacks.py:29-40): after each batch,
``i = (samples_seen - starting_from) // period``; fire if ``i >= num_invocations``
(so the very first batch fires an offset-0 hook, and a negative ``starting_from``
pre-arms a hook such as the metric feeders' warm-up window).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional


class EveryNExamples:
    """Fires ``fn(samples_seen, logs)`` approximately every ``n`` examples."""

    def __init__(self, n: int, fn: Callable[[int, Dict], None],
                 starting_from: int = 0, name: Optional[str] = None):
        # A cadence <= 0 disables the hook (never fires) instead of dividing
        # by zero on the first step — consistent with the 0-disables contract
        # of image_summaries_interval_batches.
        self.period = int(n)
        self.fn = fn
        self.starting_from = int(starting_from)
        self.num_invocations = 0
        self.samples_seen = 0
        self.name = name or getattr(fn, "__name__", "hook")

    def after_step(self, batch_size: int, logs: Dict) -> bool:
        """Advance by one batch; returns True if the hook fired."""
        self.samples_seen += int(batch_size)
        if self.period <= 0 or self.samples_seen < self.starting_from:
            return False
        i = (self.samples_seen - self.starting_from) // self.period
        if i >= self.num_invocations:
            self.num_invocations += 1
            self.fn(self.samples_seen, logs)
            return True
        return False

    def restore(self, samples_seen: int) -> None:
        """Resume hook phase from a checkpointed example counter
        (the reference re-seeds ``samples_seen`` from ``model.n_img``,
        callbacks.py:253-254)."""
        self.samples_seen = int(samples_seen)
        if self.period > 0 and self.samples_seen >= self.starting_from:
            self.num_invocations = (
                (self.samples_seen - self.starting_from) // self.period + 1
            )


class HookList:
    """A bag of :class:`EveryNExamples` hooks advanced together each step."""

    def __init__(self, hooks=()):
        self.hooks = list(hooks)

    def add(self, hook: EveryNExamples) -> "HookList":
        self.hooks.append(hook)
        return self

    def after_step(self, batch_size: int, logs: Dict) -> None:
        for h in self.hooks:
            h.after_step(batch_size, logs)

    def restore(self, samples_seen: int) -> None:
        for h in self.hooks:
            h.restore(samples_seen)
