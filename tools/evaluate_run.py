"""Post-hoc evaluation of a trained run: restore the latest checkpoint and
score SWD/FID between dataset reals and fresh generator samples.

The reference can only measure quality *during* training (metric callbacks,
/root/reference/callbacks.py:186-206); this scores any finished/interrupted
run directory on demand, with the same metric stack the trainer uses
(`Trainer.evaluate`).

    python tools/evaluate_run.py --log_dir results/02-celeba --dataset celeba \
        --resolution 128 [--num_samples 1000] [--inception] [--ema]

Prints one JSON object with eval_* metrics (per-level SWD, SWD average, FID).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(
        description="score a run dir's latest checkpoint (SWD + FID)")
    p.add_argument("--log_dir", required=True)
    p.add_argument("--dataset", choices=["mnist", "celeba"], default=None,
                   help="model family; default: inferred from the run's "
                        "run_manifest.json (1-channel → mnist, 3 → celeba)")
    p.add_argument("--resolution", type=int, default=None,
                   help="celeba resolution (must match the trained model; "
                        "default: inferred from run_manifest.json)")
    p.add_argument("--data_path", type=str, default=None,
                   help="dataset location (defaults to the standard search "
                        "paths; synthetic fallback if absent)")
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--inception", action="store_true",
                   help="FID on the InceptionV3 pool3 trunk")
    p.add_argument("--ema", action="store_true",
                   help="sample from the EMA generator weights")
    args = p.parse_args()

    import jax

    from blurred_gan_tpu.data import load_celeba, load_mnist
    from blurred_gan_tpu.metrics import FIDMetric, SWDMetric
    from blurred_gan_tpu.models import (celeba_discriminator, celeba_generator,
                                        mnist_discriminator, mnist_generator)
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       Trainer, TrainerConfig)
    from blurred_gan_tpu.train.checkpoint import load_sidecar

    # Fill unspecified model identity from the run's manifest (written by
    # the Trainer at launch): 1-channel runs are the MNIST family, 3-channel
    # the CelebA family at the manifest's resolution.
    from blurred_gan_tpu.utils.rundir import resolve_model_identity

    args.dataset, args.resolution = resolve_model_identity(
        args.log_dir, args.dataset, args.resolution)

    if args.dataset == "mnist":
        gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
        dataset = load_mnist(path=args.data_path)
    else:
        gan = GAN(celeba_generator(args.resolution),
                  celeba_discriminator(args.resolution), blurred=True)
        dataset = load_celeba(path=args.data_path,
                              resolution=args.resolution)

    hp = (load_sidecar(args.log_dir, BlurredWGANGPHyperParameters,
                       "hyper_parameters.json")
          or BlurredWGANGPHyperParameters())
    try:
        tr = Trainer(gan, hp, dataset,
                     trainer_config=TrainerConfig(
                         log_dir=args.log_dir,
                         sample_grid_every_n_examples=0,
                         checkpoint_every_n_examples=0,
                         image_summaries_interval_batches=0,
                         sample_with_ema=args.ema))
    except Exception as e:  # Orbax structure mismatch reads as gibberish —
        # the usual cause is a --dataset/--resolution that doesn't match
        # the trained model; say so before the raw error.
        raise SystemExit(
            f"checkpoint restore failed for a {args.dataset}"
            f"@{args.resolution} model — if this run was trained with a "
            f"different --dataset/--resolution, pass the matching ones "
            f"(original error: {type(e).__name__}: {e})") from e
    if tr.restored_examples == 0:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    if args.ema and not jax.tree_util.tree_leaves(tr.state.g_ema):
        raise SystemExit("--ema: this run has no EMA weights "
                         "(train with --ema_decay > 0)")

    metrics = [SWDMetric(), FIDMetric()]
    if args.inception:
        from blurred_gan_tpu.metrics import inception_feature_fn

        metrics[1] = FIDMetric(feature_fn=inception_feature_fn())
    out = tr.evaluate(num_samples=args.num_samples, metrics=metrics,
                      seed=args.seed)
    out = {k: round(float(v), 4) for k, v in out.items()}
    out["examples_seen"] = int(tr.restored_examples)
    tr.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
