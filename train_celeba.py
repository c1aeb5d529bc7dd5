"""Train a blurred WGAN-GP on CelebA at 64² or 128² (reference: demo_celeba.py).

Capability parity with /root/reference/demo_celeba.py: the six-stage DCGAN pair at
128² (smaller pairs at lower resolutions), σ₀ high enough to wash out full detail
(the CelebA demo hard-codes max_value=5, demo_celeba.py:226), SWD/FID cadence,
checkpoints, resume. Data comes from a local aligned-CelebA directory
(``$DATASETS_DIR/celeba/img_align_celeba``) or a synthetic surrogate.

    python train_celeba.py --resolution 128 --epochs 10
    python train_celeba.py --resolution 64 --max_steps 50 --log_dir /tmp/run
"""

from __future__ import annotations

import argparse

import jax

from blurred_gan_tpu.runtime import enable_fast_prng, maybe_initialize_distributed

enable_fast_prng()
maybe_initialize_distributed()

from blurred_gan_tpu.data import load_celeba
from blurred_gan_tpu.metrics import FIDMetric, SWDMetric
from blurred_gan_tpu.models import celeba_discriminator, celeba_generator
from blurred_gan_tpu.sched.blur import AdaptiveBlurController, BlurDecayController
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    MetricFeeder,
    Trainer,
    TrainerConfig,
    TrainingConfig,
)
from train_mnist import make_mesh


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    BlurredWGANGPHyperParameters.add_arguments(parser)
    TrainingConfig.add_arguments(parser)
    parser.add_argument("--resolution", type=int, default=128,
                        choices=[8, 16, 32, 64, 128, 256, 512])
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--adaptive", action="store_true")
    parser.add_argument("--celeba_path", type=str, default=None)
    parser.add_argument("--max_blur_std", type=float, default=5.0,
                        help="sigma_0 (demo_celeba.py:226 uses 5)")
    parser.add_argument("--num_examples", type=int, default=None)
    parser.add_argument("--inception_fid", action="store_true",
                        help="score FID on the InceptionV3 pool3 trunk "
                             "(local weights; see metrics/inception.py)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 activations (MXU-native)")
    parser.add_argument("--fast_gen", action="store_true",
                        help="with --bf16: keep generator BatchNorm "
                             "arithmetic and the final tanh in bfloat16 "
                             "instead of float32 round-trips (BN statistics "
                             "still accumulate in float32; A/B'd in "
                             "BASELINE.md)")
    parser.add_argument("--gen_upsample", default="transpose",
                        choices=["transpose", "resize"],
                        help="generator upsampling: 'transpose' = "
                             "ConvTranspose 5x5 s2 (reference parity); "
                             "'resize' = nearest-2x + Conv 5x5 "
                             "(resize-convolution, Odena et al. 2016 — flat "
                             "checkerboard prior; A/B'd in BASELINE.md)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--run_name", type=str, default=None,
                        help="create an auto-numbered results/NN-<name> run dir")
    parser.add_argument("--device_resident", action="store_true",
                        help="park the dataset in HBM and scan many steps per"
                             " dispatch (full device rate; needs a"
                             " memory-resident dataset — CelebA-128 uint8 is"
                             " ~9.5 GB; SWD/FID cadence measured at chunk"
                             " boundaries)")
    parser.add_argument("--chunk_steps", type=int, default=100)
    parser.add_argument("--sample_grid_every", type=int, default=5_000,
                        help="examples between fixed-latent sample grids "
                             "(reference cadence 5k, callbacks.py:209-236; "
                             "raise for high resolutions where the host-side "
                             "PNG writing competes with training dispatch)")
    parser.add_argument("--checkpoint_every", type=int, default=10_000,
                        help="examples between checkpoints (reference "
                             "cadence 10k, callbacks.py:239-246)")
    parser.add_argument("--fetch_timeout_s", type=float, default=0.0,
                        help="device-hang watchdog: per-train-step budget "
                             "(seconds) for the metric fetch — chunked mode "
                             "scales it by chunk_steps — failing with "
                             "DeviceHangError instead of hanging if the "
                             "device wedges (0 = off; resume from the "
                             "latest checkpoint after a trip)")
    args = parser.parse_args()

    hparams = BlurredWGANGPHyperParameters.from_args(args)
    config = TrainingConfig.from_args(args)
    if args.run_name:
        from blurred_gan_tpu.utils import create_result_subdir

        config.log_dir = create_result_subdir("results", args.run_name)
        config.checkpoint_dir = ""
    n_dev = max(len(jax.devices()), 1)
    hparams.global_batch_size = hparams.batch_size * n_dev

    dataset = load_celeba(path=args.celeba_path, resolution=args.resolution,
                          num_examples=args.num_examples)
    if args.device_resident and not hasattr(dataset, "images"):
        # Real-data folders are lazy; chunked training parks the corpus in
        # HBM, so decode it once up front (native parallel loader).
        gb = (dataset.num_examples * args.resolution * args.resolution * 3
              / 1e9)
        print(f"[train_celeba] materializing {dataset.num_examples} images "
              f"for --device_resident (~{gb:.1f} GB uint8)")
        dataset = dataset.materialize()
    total_examples = dataset.num_examples * args.epochs

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    gen_kw = ({"bn_dtype": dtype, "output_f32": False}
              if (args.fast_gen and args.bf16) else {})
    gen_kw["upsample"] = args.gen_upsample
    if args.gen_upsample == "transpose" and args.max_blur_std >= 1.0:
        # Heavy-blur curricula never show the critic pixel-scale structure,
        # so the ConvTranspose checkerboard prior goes unpenalised and the
        # unblurred eval bills it (BASELINE.md "Heavy-64 experiment arms":
        # resize deletes the artifact band on every seed and wins ~30x on
        # feature metrics). Parity default stays transpose; say so loudly.
        print("[train_celeba] note: max_blur_std "
              f"{args.max_blur_std:g} >= 1 with the 'transpose' upsampler - "
              "heavy-blur curricula measure substantially better with "
              "--gen_upsample resize (see BASELINE.md)", flush=True)
    gan = GAN(celeba_generator(args.resolution, compute_dtype=dtype, **gen_kw),
              celeba_discriminator(args.resolution, compute_dtype=dtype),
              blurred=True)

    blur_ctrl = adaptive = None
    if args.adaptive:
        adaptive = AdaptiveBlurController(max_value=args.max_blur_std)
    else:
        blur_ctrl = BlurDecayController(
            total_n_training_examples=total_examples,
            max_value=args.max_blur_std)

    fid_metric = FIDMetric()
    if args.inception_fid:
        from blurred_gan_tpu.metrics import inception_feature_fn

        fid_metric = FIDMetric(feature_fn=inception_feature_fn())
    feeders = [
        MetricFeeder(SWDMetric(), every_n_examples=50_000, num_samples=1000,
                     name="swd"),
        MetricFeeder(fid_metric, every_n_examples=50_000, num_samples=100,
                     name="fid"),
    ]

    trainer = Trainer(
        gan, hparams, dataset,
        trainer_config=TrainerConfig(
            log_dir=config.log_dir,
            checkpoint_dir=config.checkpoint_dir,
            image_summaries_interval_batches=(
                config.save_image_summaries_interval),
            sample_grid_every_n_examples=args.sample_grid_every,
            checkpoint_every_n_examples=args.checkpoint_every,
            device_fetch_timeout_s=args.fetch_timeout_s,
            seed=args.seed),
        mesh=make_mesh(),
        blur_controller=blur_ctrl,
        adaptive_controller=adaptive,
        metric_feeders=feeders,
        config_sidecars={"hparams": hparams, "config": config},
    )
    print(f"[train_celeba] res={args.resolution} devices={n_dev} "
          f"global_bs={hparams.global_batch_size} dataset={dataset.name}")
    if args.device_resident:
        # Quantised to whole chunks, rounded UP so at least max_steps run
        # (floor would silently drop the remainder; see train_mnist.py).
        chunk_steps = args.chunk_steps
        max_chunks = None
        if args.max_steps is not None:
            chunk_steps = min(chunk_steps, args.max_steps)
            max_chunks = -(-args.max_steps // chunk_steps)
            if args.max_steps % chunk_steps:
                print(f"[train_celeba] --max_steps {args.max_steps} rounds up "
                      f"to {max_chunks * chunk_steps} (whole chunks of "
                      f"{chunk_steps})")
        trainer.fit_device_resident(total_examples=total_examples,
                                    chunk_steps=chunk_steps,
                                    max_chunks=max_chunks)
    else:
        trainer.fit(total_examples=total_examples, max_steps=args.max_steps)
    trainer.close()


if __name__ == "__main__":
    main()
