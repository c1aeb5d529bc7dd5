"""Standalone sample-set scoring CLI: SWD and FID between two sets of images.

The reference computes these metrics only from inside a training run
(/root/reference/metrics.py via callbacks); this exposes the same on-device
metric stack (metrics/swd.py, metrics/fid.py) to the command line for ad-hoc
model comparison, sweep post-processing, and scoring samples produced by any
framework.

Inputs (either side): an ``.npz`` with a ``samples`` array (N,H,W,C — the
layout written by generate_samples/quality_parity), an ``.npy`` array, or an
image directory (decoded via the native loader, centre-crop + resize like the
CelebA pipeline). uint8 [0,255] and float [-1,1] are both accepted.

Examples::

    python tools/score.py --real data/celeba_val/ --fake runs/s0_samples.npz
    python tools/score.py --real a.npz --fake b.npz --inception \
        --inception_size 299 --limit 5000

Prints one JSON object: per-level SWD (x1e3), SWD average, and FID
(fixed-seed random-conv extractor by default; ``--inception`` uses the
InceptionV3 pool3 trunk — real weights when available via
$INCEPTION_WEIGHTS / $DATASETS_DIR/inception_v3.npz, otherwise the loudly
announced fixed-seed random trunk, identical for both sides).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(path: str, resolution: int | None, limit: int | None) -> np.ndarray:
    """Any supported input → float32 NHWC in [-1, 1]."""
    if os.path.isdir(path):
        from blurred_gan_tpu.data.pipeline import ImageFolderDataset

        if resolution is None:
            raise SystemExit("--resolution is required with directory inputs")
        ds = ImageFolderDataset(path, resolution, num_examples=limit)
        # Chunked decode with progress — one shot over a full CelebA folder
        # would be a single ~9.5 GB silent allocation.
        x = ds.materialize().images
    elif path.endswith(".npz"):
        with np.load(path) as d:
            key = "samples" if "samples" in d else list(d.keys())[0]
            x = d[key]
    elif path.endswith(".npy"):
        x = np.load(path)
    else:
        raise SystemExit(f"unsupported input {path!r} (npz/npy/dir)")
    if x.ndim == 3:  # (N,H,W) grayscale
        x = x[..., None]
    if x.ndim != 4:
        raise SystemExit(f"{path}: expected (N,H,W,C) images, got {x.shape}")
    if limit:
        x = x[:limit]
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 127.5 - 1.0
    return np.asarray(x, np.float32)


def main() -> None:
    p = argparse.ArgumentParser(
        description="SWD + FID between two sample sets (npz/npy/image dir)")
    p.add_argument("--real", required=True, help="reference-side samples")
    p.add_argument("--fake", required=True, help="candidate-side samples")
    p.add_argument("--resolution", type=int, default=None,
                   help="decode resolution for directory inputs")
    p.add_argument("--limit", type=int, default=None,
                   help="score at most N images per side")
    p.add_argument("--batch", type=int, default=100,
                   help="metric update batch size")
    p.add_argument("--inception", action="store_true",
                   help="FID on the InceptionV3 pool3 trunk instead of the "
                        "fixed-seed random-conv extractor")
    p.add_argument("--inception_size", type=int, default=75,
                   help="InceptionV3 input resize (299 = the reference's FID "
                        "protocol; 75 = the smallest the stem accepts, ~16x "
                        "cheaper, preserves relative gaps)")
    p.add_argument("--no_swd", action="store_true", help="skip SWD")
    p.add_argument("--prdc", action="store_true",
                   help="also report precision/recall/density/coverage "
                        "(Naeem et al. 2020) over the same features as FID — "
                        "separates fidelity (precision, density) from "
                        "diversity (recall, coverage)")
    p.add_argument("--prdc_k", type=int, default=5,
                   help="k-NN manifold size for --prdc (paper default 5)")
    p.add_argument("--kid", action="store_true",
                   help="also report Kernel Inception Distance (Bińkowski "
                        "et al. 2018) over the same features as FID — the "
                        "unbiased small-sample companion to FID")
    p.add_argument("--kid_subsets", type=int, default=100,
                   help="--kid: number of MMD subsets (paper default 100)")
    p.add_argument("--kid_subset_size", type=int, default=1000,
                   help="--kid: samples per subset (paper default 1000; "
                        "clamped to the available count)")
    args = p.parse_args()

    reals = _load(args.real, args.resolution, args.limit)
    fakes = _load(args.fake, args.resolution, args.limit)
    if reals.shape[1:] != fakes.shape[1:]:
        raise SystemExit(f"shape mismatch: real {reals.shape[1:]} vs "
                         f"fake {fakes.shape[1:]}")
    n = min(len(reals), len(fakes))
    reals, fakes = reals[:n], fakes[:n]

    from blurred_gan_tpu.metrics import FIDMetric, SWDMetric

    out = {"n_images": int(n), "image_shape": list(reals.shape[1:])}
    if not args.no_swd:
        if reals.shape[1] >= 16:
            swd = SWDMetric()
            for i in range(0, n, args.batch):
                swd.update_state(reals[i:i + args.batch],
                                 fakes[i:i + args.batch])
            out.update({k: round(float(v), 3)
                        for k, v in swd.results().items()})
        else:
            out["swd"] = None  # pyramid needs >=16 px (protocol floor)

    feature_fn = None
    if args.inception:
        from blurred_gan_tpu.metrics import inception_feature_fn

        feature_fn = inception_feature_fn(resize_to=args.inception_size)
    fid = FIDMetric(feature_fn=feature_fn)
    for i in range(0, n, args.batch):
        fid.update_state(reals[i:i + args.batch], fakes[i:i + args.batch])
    out["fid_inception" if args.inception else "fid_randconv"] = round(
        float(fid.result()), 4)

    if args.prdc:
        from blurred_gan_tpu.metrics import prdc_from_images

        # fid.feature_fn is resolved after the first update (the random-conv
        # default is built lazily from the batch shape) — reuse it so PRDC
        # sees the identical feature space.
        out.update({k: round(v, 4) for k, v in prdc_from_images(
            reals, fakes, feature_fn=fid.feature_fn, k=args.prdc_k,
            batch=args.batch).items()})

    if args.kid:
        from blurred_gan_tpu.metrics import kid_from_images

        out.update({k: round(v, 6) for k, v in kid_from_images(
            reals, fakes, feature_fn=fid.feature_fn,
            n_subsets=args.kid_subsets, subset_size=args.kid_subset_size,
            batch=args.batch).items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
