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


def load_run_manifest(log_dir: str) -> dict | None:
    """The run's ``run_manifest.json`` (written by every Trainer), or None.

    Carries what the hparams/config sidecars (the reference's JSON pair,
    demo_mnist.py:153-169) don't: dataset identity, image shape, latent size
    — enough for post-hoc tools to rebuild the right model unaided.
    """
    path = os.path.join(log_dir, "run_manifest.json")
    if not os.path.exists(path):
        return None
    import json

    with open(path) as f:
        return json.load(f)


def resolve_model_identity(log_dir: str, dataset: str | None,
                           resolution: int | None) -> tuple[str, int]:
    """Fill unspecified (dataset, resolution) from the run's manifest.

    1-channel runs are the MNIST family, 3-channel the CelebA family at the
    manifest's resolution. Raises SystemExit with an actionable message when
    neither the flags nor a manifest pin the model down (pre-manifest runs).
    """
    if dataset is None or resolution is None:
        manifest = load_run_manifest(log_dir)
        shape = (manifest or {}).get("image_shape")
        if shape:
            if dataset is None:
                dataset = "mnist" if shape[-1] == 1 else "celeba"
            if resolution is None:
                resolution = int(shape[0])
    if dataset is None:
        raise SystemExit(
            f"no {os.path.join(log_dir, 'run_manifest.json')} (pre-manifest "
            "run dir): pass --dataset (and --resolution for celeba)")
    if resolution is None:
        resolution = 128
    return dataset, resolution


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
