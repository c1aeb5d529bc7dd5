"""Device-hang watchdog: bounded-time device fetches.

Failure *detection* for the one blocking surface a JAX host loop cannot
otherwise bound: materialising device values (``np.asarray`` /
``block_until_ready``). On healthy hardware these return in microseconds to
milliseconds; when the device or its transport wedges (observed here: a
remote-TPU relay that stopped completing executions mid-run) they block
forever, and the training process hangs silently with no way to distinguish
"slow step" from "dead device".

The reference has no equivalent (its failure handling is save-on-Ctrl-C,
/root/reference/demo_mnist.py:207-208 — a *human* is the hang detector);
SURVEY.md §5.3 calls for preemption/failure coverage beyond that. This module
turns an unbounded hang into a diagnosable exception so supervisors can
restart the job and resume from the latest checkpoint (resume is bit-exact,
train/checkpoint.py).

Semantics
---------
``fetch(x, timeout_s=T)`` materialises ``x`` in a daemon worker thread and
joins with a deadline. On expiry it raises :class:`DeviceHangError`. The
worker thread cannot be cancelled (XLA fetches are not interruptible) and is
*abandoned*: it stays blocked inside the runtime, but being a daemon it never
keeps the process alive. After a ``DeviceHangError`` the process should be
treated as poisoned — checkpointing is impossible (saving would fetch from
the same wedged device) — so the only correct reaction is to exit and resume
from the last completed checkpoint. The error message says exactly that.

With ``timeout_s`` falsy the call is a plain direct fetch with zero overhead
— the watchdog is strictly opt-in (`TrainerConfig.device_fetch_timeout_s`).
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import numpy as np


class DeviceHangError(RuntimeError):
    """A device fetch exceeded its watchdog deadline."""


def _materialize(x: Any, to_numpy: bool):
    """The actual blocking operation, isolated so tests can stub it."""
    if to_numpy:
        return np.asarray(x)
    import jax

    return jax.block_until_ready(x)


def fetch(x: Any, timeout_s: Optional[float] = None, *,
          what: str = "device fetch", to_numpy: bool = True):
    """Materialise ``x`` (``np.asarray`` or ``block_until_ready``) with an
    optional hang deadline.

    Args:
      x: array (or pytree, with ``to_numpy=False``) to materialise.
      timeout_s: deadline in seconds; ``None``/``0`` means fetch directly on
        the calling thread (no watchdog, no extra thread).
      what: label for the error message ("step metrics", "eval batch", ...).
      to_numpy: ``True`` -> ``np.asarray(x)`` (host copy); ``False`` ->
        ``jax.block_until_ready(x)`` (await only, works on pytrees).

    Raises:
      DeviceHangError: the deadline expired. The worker thread is abandoned
        (daemon); the caller should exit and rely on checkpoint resume.
    """
    if not timeout_s or timeout_s <= 0:
        return _materialize(x, to_numpy)

    result: list = []
    error: list = []

    def _run() -> None:
        try:
            result.append(_materialize(x, to_numpy))
        except BaseException as e:  # noqa: BLE001 — re-raised on the caller
            error.append(e)

    worker = threading.Thread(target=_run, daemon=True,
                              name=f"fetch-watchdog[{what}]")
    worker.start()
    worker.join(timeout_s)
    if worker.is_alive():
        raise DeviceHangError(
            f"{what} did not complete within {timeout_s:.0f}s — the device "
            "or its transport is likely wedged (not merely slow: healthy "
            "fetches complete with the step, and compile-time is budgeted "
            "separately). The fetch thread is abandoned; do NOT attempt to "
            "checkpoint from this process (saving would fetch from the same "
            "wedged device). Restart and resume from the latest checkpoint.")
    if error:
        raise error[0]
    return result[0]
