"""Auto-incrementing run directories (utils.py:14-47 capability)."""

from __future__ import annotations

import glob
import os


def create_result_subdir(result_dir: str, run_name: str) -> str:
    """Create ``result_dir/NN-run_name`` with NN = max existing + 1.

    Mirrors /root/reference/utils.py:14-24.
    """
    paths = glob.glob(os.path.join(result_dir, f"*-{run_name}"))
    run_ids = []
    for p in paths:
        base = os.path.basename(p).split("-")[0]
        if base.isdigit():
            run_ids.append(int(base))
    run_id = max(run_ids, default=0) + 1
    path = os.path.join(result_dir, f"{run_id:02d}-{run_name}")
    os.makedirs(path)
    return path


def locate_latest_checkpoint_dir(result_dir: str, run_name: str) -> str | None:
    """Latest run's checkpoint dir, or None (utils.py:35-47 capability)."""
    paths = glob.glob(os.path.join(result_dir, f"*-{run_name}"))
    best, best_id = None, -1
    for p in paths:
        base = os.path.basename(p).split("-")[0]
        if base.isdigit() and int(base) > best_id:
            best, best_id = p, int(base)
    if best is None:
        return None
    ckpt = os.path.join(best, "checkpoints")
    return ckpt if os.path.isdir(ckpt) else None
