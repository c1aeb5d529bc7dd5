"""Diagnose GAN sample sets: pixel stats, spectrum bands, blurred objective.

The round-4 heavy-blur diagnosis tool (BASELINE.md "Heavy-blur regime
diagnosis"): given quality_parity sample sets (``<side>_samples_s<seed>.npz``
with a ``samples`` array in [-1, 1] NHWC), prints one JSON line per set with

- pixel statistics: mean / std / tanh-saturation fraction (|x| > 0.98) —
  under heavy blur the critic cannot penalise pixel-scale structure, so
  WGAN-GP's near-linear critic drives outputs to the rails (a bang-bang
  solution); the *scale* of the resulting dither is what differs between
  architectures;
- radial power-spectrum band energies relative to the real corpus
  (low r<4 / mid 4-12 / hi 12-24 / vhi 24+ cycles per image) — localises
  each generator's artifact prior in frequency;
- optionally (``--sigma``) the "blurred objective": SWD and random-conv FID
  between sigma-blurred fakes and sigma-blurred reals — i.e. how well the
  generator matched the distribution THE CRITIC ACTUALLY SAW. A gap here is
  a training-dynamics gap; a clean match here with bad sharp scores is an
  unconstrained-spectrum (artifact-prior) gap.

Protocol mirrors benchmarks/quality_parity.py evaluate: the real corpus is
the deterministic synthetic fallback, held-out order (last N of the fixed
RandomState(10_000) shuffle). Run on CPU or the TPU; scoring is
platform-independent to ~0.1% (BASELINE.md round 2).

``--grids_from <dir>``: clip-domain fallback for sides whose npz sample
sets no longer exist but whose 8x8 grid PNGs are tracked (the round-4
reference heavy-blur sets: results/quality/heavy64/grids/). Those grids
were rendered straight from [-1, 1] samples through samples_grid's
clip(x, 0, 1) (utils/images.py:47), so the negative half is crushed; to
keep comparisons paired, when this flag is set EVERY side — reals, npz
sets, grid sets — is transformed to the same clip(x, 0, 1) domain and
subsampled to the 64 grid tiles' count. Clip-domain band ratios are
qualitative (which band carries the excess), not protocol scores; the
grid-roundtrip fidelity of that signature is pinned by
tests/test_diagnose_grid.py.

Usage:
  python tools/diagnose_samples.py --dir /tmp/qp_hb64 --config celeba64 \
      --seeds 6,7,8 --sides ref,ours --sigma 4.94
  python tools/diagnose_samples.py --dir results/quality/heavy64/work \
      --config celeba64 --seeds 6 --sides ref,ours,ours_adaptive \
      --grids_from results/quality/heavy64/grids
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

N_EVAL = 1000
BANDS = (("low_r<4", 0, 4), ("mid_4-12", 4, 12),
         ("hi_12-24", 12, 24), ("vhi_24+", 24, 10 ** 9))


def spectrum_bands(x: np.ndarray) -> dict:
    """Radial power-spectrum energy per band of a [-1,1] NHWC image set."""
    g = x.mean(axis=-1)
    g = g - g.mean(axis=(1, 2), keepdims=True)
    power = (np.abs(np.fft.fftshift(np.fft.fft2(g), axes=(1, 2))) ** 2
             ).mean(axis=0)
    h, w = power.shape
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
    return {name: float(power[(r >= lo) & (r < hi)].sum())
            for name, lo, hi in BANDS}


def pixel_stats(x: np.ndarray, clip_domain: bool = False) -> dict:
    stats = {"mean": round(float(x.mean()), 4),
             "std": round(float(x.std()), 4),
             "sat": round(float((np.abs(x) > 0.98).mean()), 4)}
    if clip_domain:  # clip(x, 0, 1) domain: rails sit at 0 and 1
        stats["rail0"] = round(float((x < 0.01).mean()), 4)
        stats["rail1"] = round(float((x > 0.99).mean()), 4)
        stats["sat"] = round(stats["rail0"] + stats["rail1"], 4)
    return stats


def load_grid_samples(path: str, res: int, pad: int = 2,
                      grid=(8, 8)) -> np.ndarray:
    """Recover the 64 tiles of a samples_grid PNG as a clip-domain set.

    The PNG stores clip(x, 0, 1) of the original [-1, 1] samples
    (utils/images.py:41-50 renders the raw array); the inverse here keeps
    that clip domain (values in [0, 1]) rather than remapping to [-1, 1],
    so callers compare every side under the same transform.
    """
    from PIL import Image

    img = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    rows, cols = grid
    tiles = []
    for i in range(rows):
        for j in range(cols):
            y, x = pad + i * (res + pad), pad + j * (res + pad)
            tiles.append(img[y:y + res, x:x + res])
    return np.stack(tiles)


def to_clip_domain(x: np.ndarray) -> np.ndarray:
    """The samples_grid render transform: [-1, 1] -> clip(x, 0, 1)."""
    return np.clip(x, 0.0, 1.0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True,
                   help="quality_parity --out directory with *_samples_s*.npz")
    p.add_argument("--config", default="celeba64",
                   help="quality_parity config name (corpus identity)")
    p.add_argument("--seeds", default="0")
    p.add_argument("--sides", default="ref,ours")
    p.add_argument("--sigma", type=float, default=0.0,
                   help="> 0: also score the blurred objective (SWD + "
                        "random-conv FID between sigma-blurred fakes and "
                        "sigma-blurred reals; the end-of-run sigma of the "
                        "runs being diagnosed, e.g. 4.94 for the 60k-example "
                        "heavy-blur CelebA protocol)")
    p.add_argument("--save_grids", default="",
                   help="directory: also write 8x8 sample grids per set")
    p.add_argument("--grids_from", default="",
                   help="directory with g_<side>_s<seed>.png grids: fall "
                        "back to grid tiles for sides whose npz is missing; "
                        "switches EVERY side to the paired clip(x,0,1) "
                        "domain at n=64 (see module doc)")
    args = p.parse_args()

    import quality_parity as qp

    cfg = qp.CONFIGS[args.config]
    res = cfg.image_shape[0]
    ds = qp._corpus(cfg)
    order = np.random.RandomState(10_000).permutation(ds.num_examples)
    reals = ds.images[order[-N_EVAL:]].astype(np.float32) / 127.5 - 1.0
    n_eval = N_EVAL
    if args.grids_from:
        n_eval = 64
        reals = to_clip_domain(reals[:n_eval])
    reals_bank = spectrum_bands(reals)
    print(json.dumps({"set": "reals", "n": len(reals),
                      "domain": "clip01" if args.grids_from else "pm1",
                      **pixel_stats(reals, clip_domain=bool(args.grids_from)),
                      "bands": {k: round(v, 1)
                                for k, v in reals_bank.items()}}),
          flush=True)

    blur_np = None
    reals_blur = None
    if args.sigma > 0:
        import jax
        import jax.numpy as jnp

        from blurred_gan_tpu.ops.blur import blur_images

        blur_j = jax.jit(
            lambda v: blur_images(v, jnp.float32(args.sigma)))

        def blur_np(x):  # noqa: F811 — bound conditionally by design
            return np.concatenate(
                [np.asarray(blur_j(jnp.asarray(x[i:i + 100])))
                 for i in range(0, len(x), 100)])

        reals_blur = blur_np(reals)

    def blurred_objective(fakes: np.ndarray) -> dict:
        from blurred_gan_tpu.metrics import FIDMetric, SWDMetric

        swd, fid = SWDMetric(), FIDMetric()
        fb = blur_np(fakes)
        for i in range(0, len(fakes), 100):
            swd.update_state(reals_blur[i:i + 100], fb[i:i + 100])
            fid.update_state(reals_blur[i:i + 100], fb[i:i + 100])
        out = {k: round(float(v), 2) for k, v in swd.results().items()}
        out["fid_rc"] = round(float(fid.result()), 2)
        return out

    for seed in [int(s) for s in args.seeds.split(",")]:
        for side in args.sides.split(","):
            path = os.path.join(args.dir, f"{side}_samples_s{seed}.npz")
            source = "npz"
            if os.path.exists(path):
                with np.load(path) as d:
                    fakes = d["samples"]
                if args.grids_from:
                    fakes = to_clip_domain(fakes[:n_eval])
            elif args.grids_from:
                gpath = os.path.join(args.grids_from,
                                     f"g_{side}_s{seed}.png")
                if not os.path.exists(gpath):
                    print(f"[skip] {path} and {gpath} missing", flush=True)
                    continue
                fakes = load_grid_samples(gpath, res)
                source = "grid_png"
            else:
                print(f"[skip] {path} missing", flush=True)
                continue
            row = {"set": f"{side}_s{seed}", "n": len(fakes),
                   "source": source,
                   **pixel_stats(fakes,
                                 clip_domain=bool(args.grids_from))}
            bands = spectrum_bands(fakes)
            # Bands past the Nyquist radius are empty at small resolutions
            # (e.g. vhi_24+ at 28x28): no ratio to report there.
            row["band_ratio_vs_reals"] = {
                k: round(bands[k] / reals_bank[k], 3)
                for k in bands if reals_bank[k] > 0}
            if args.sigma > 0:
                row["blurred_objective"] = blurred_objective(fakes)
            print(json.dumps(row), flush=True)
            if args.save_grids:
                from blurred_gan_tpu.utils.images import save_image_grid

                os.makedirs(args.save_grids, exist_ok=True)
                save_image_grid(fakes[:64], os.path.join(
                    args.save_grids, f"{side}_s{seed}.png"))


if __name__ == "__main__":
    main()
