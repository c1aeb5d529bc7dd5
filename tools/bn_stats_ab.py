"""Generator BatchNorm batch-vs-running statistics A/B on a trained run.

Round-4 VERDICT stretch question (item 8): does the mid-frequency stripe
prior the heavy-blur diagnosis found (BASELINE.md "Heavy-blur regime
diagnosis", Finding 2) come from the *weights* or from the BN
*normalisation statistics* used at sampling time?

During training the generator always normalises with per-batch statistics
(train=True — the reference does the same: BatchNorm under Keras
``training=True``, /root/reference/wgan.py:162); the eval protocol samples
with the running averages (train=False). Under the heavy-blur regime the
two can diverge: the critic never constrains pixel-scale structure, so
activation statistics drift freely and the running averages lag. This tool
restores a run's checkpoint and generates the SAME eval latents both ways,
then prints the diagnosis rows (pixel stats + spectrum-band ratios vs the
held-out reals, protocol of tools/diagnose_samples.py):

    python tools/bn_stats_ab.py \
        --log_dir results/quality/heavy64/work/ours_refscale_log_s6 \
        [--n 1000] [--batch 100] [--out_npz_dir DIR]

If the stripe band (hi_12-24 / vhi_24+ excess) survives under batch
statistics, the artifact lives in the weights; if it collapses, it is a
train/eval BN-statistics mismatch and EMA-of-stats (or sampling with
train=True batches) is the fix.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def main() -> None:
    p = argparse.ArgumentParser(
        description="BN batch-vs-running statistics sampling A/B")
    p.add_argument("--log_dir", required=True)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--batch", type=int, default=100,
                   help="generation minibatch = the BN statistics window "
                        "in train=True mode")
    p.add_argument("--corpus_n", type=int, default=20_000,
                   help="synthetic corpus size of the run's config "
                        "(quality_parity celeba configs use 20k)")
    p.add_argument("--out_npz_dir", default="",
                   help="optionally save both sample sets as npz")
    args = p.parse_args()

    import jax.numpy as jnp

    from diagnose_samples import pixel_stats, spectrum_bands
    from quality_parity import _eval_latents
    from blurred_gan_tpu.data.pipeline import synthetic_dataset
    from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       Trainer, TrainerConfig)
    from blurred_gan_tpu.train.checkpoint import load_sidecar
    from blurred_gan_tpu.utils.rundir import resolve_model_identity

    dataset_kind, resolution = resolve_model_identity(args.log_dir,
                                                      None, None)
    if dataset_kind != "celeba":
        raise SystemExit("BN A/B targets the CelebA family runs")
    # quality_parity arm runs may use non-default generator knobs; the run
    # manifest records the generator module config, but upsample mode is the
    # only knob that changes the param tree shape — recover it from the dir
    # name convention (ours_resize_*) to keep restore structural.
    upsample = "resize" if "resize" in os.path.basename(
        args.log_dir.rstrip("/")) else "transpose"
    gan = GAN(celeba_generator(resolution, upsample=upsample),
              celeba_discriminator(resolution), blurred=True)
    corpus = synthetic_dataset((resolution, resolution, 3),
                               num_examples=args.corpus_n)
    hp = (load_sidecar(args.log_dir, BlurredWGANGPHyperParameters,
                       "hyper_parameters.json")
          or BlurredWGANGPHyperParameters())
    tr = Trainer(gan, hp, corpus,
                 trainer_config=TrainerConfig(
                     log_dir=args.log_dir,
                     sample_grid_every_n_examples=0,
                     checkpoint_every_n_examples=0,
                     image_summaries_interval_batches=0))
    if tr.restored_examples == 0:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")

    latents = jnp.asarray(_eval_latents()[:args.n])
    state = tr.state

    def sample(train: bool) -> np.ndarray:
        outs = []
        for i in range(0, args.n, args.batch):
            img = gan.generate(state.g_params, state.g_stats,
                               latents[i:i + args.batch], train=train)[0]
            outs.append(np.asarray(img, dtype=np.float32))
        return np.concatenate(outs)

    # Held-out reals, the quality_parity/diagnose protocol: last n of the
    # fixed RandomState(10_000) shuffle.
    order = np.random.RandomState(10_000).permutation(corpus.num_examples)
    reals = corpus.images[order[-args.n:]].astype(np.float32) / 127.5 - 1.0
    ref_bands = spectrum_bands(reals)
    row = {"set": "reals", "n": int(args.n)}
    row.update(pixel_stats(reals))
    row["bands"] = {k: round(v, 1) for k, v in ref_bands.items()}
    print(json.dumps(row), flush=True)

    name = os.path.basename(args.log_dir.rstrip("/"))
    for mode, train in (("bn_running", False), ("bn_batch", True)):
        x = sample(train)
        bands = spectrum_bands(x)
        row = {"set": f"{name}:{mode}", "n": int(args.n),
               "bn_window": (args.batch if train else "running")}
        row.update(pixel_stats(x))
        row["band_ratio_vs_reals"] = {
            k: round(bands[k] / ref_bands[k], 3) for k in bands}
        print(json.dumps(row), flush=True)
        if args.out_npz_dir:
            os.makedirs(args.out_npz_dir, exist_ok=True)
            np.savez(os.path.join(args.out_npz_dir,
                                  f"{name}_{mode}.npz"), samples=x)
    tr.close()


if __name__ == "__main__":
    main()
