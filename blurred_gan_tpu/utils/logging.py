"""Observability: TensorBoard + JSONL metric/image logging.

Capability parity with the reference's three observability tiers (SURVEY.md §5.5):
per-batch scalar metrics, TensorBoard scalars/images, and saved sample-grid PNGs.
Global step is **images seen** (wgan.py:100) so runs are comparable across batch
sizes — preserved here.

The writer duck-types over two sinks: tensorboardX (if importable) and an
always-on JSONL event log (one JSON object per line — machine-readable run
history, greppable without TensorBoard; this replaces the reference's reliance on
TF summaries alone). Both live under the run's ``log_dir``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 enabled: bool = True):
        """``enabled=False`` turns every write into a no-op — multi-host runs
        gate non-process-0 loggers so a shared log_dir isn't interleaved."""
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.enabled = enabled
        self._jsonl = (open(os.path.join(log_dir, "events.jsonl"), "a",
                            buffering=1) if enabled else None)
        self._tb = None
        if use_tensorboard and enabled:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        if not self.enabled:
            return
        clean = {}
        for k, v in values.items():
            try:
                clean[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(
            {"step": int(step), "time": time.time(), **clean}) + "\n")
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, int(step))

    def image(self, step: int, tag: str, image_hwc_uint8: np.ndarray) -> None:
        """Log one HWC uint8 image (TensorBoard only; PNGs are saved separately
        by the sample-grid hook, callbacks.py:233)."""
        if self._tb is not None:
            self._tb.add_image(tag, image_hwc_uint8, int(step),
                               dataformats="HWC")

    def hparams(self, hparams: Dict) -> None:
        """Log run hyperparameters (the HParams-plugin capability,
        demo_mnist.py:194)."""
        if not self.enabled:
            return
        self._jsonl.write(json.dumps({"hparams": hparams}) + "\n")
        if self._tb is not None:
            try:
                self._tb.add_hparams(
                    {k: v for k, v in hparams.items()
                     if isinstance(v, (int, float, str, bool))}, {})
            except Exception:
                pass

    def text(self, step: int, tag: str, text: str) -> None:
        if not self.enabled:
            return
        self._jsonl.write(json.dumps({"step": int(step), tag: text}) + "\n")
        if self._tb is not None:
            self._tb.add_text(tag, text, int(step))

    def flush(self) -> None:
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
