"""Train a blurred WGAN-GP on MNIST 28×28 — the framework's first demo.

Capability parity with /root/reference/demo_mnist.py: dataclass-driven CLI, blurred
WGAN-GP with the DCGAN pair, open-loop exponential σ decay (or the adaptive
controller with ``--adaptive``), SWD/FID eval every 50k examples, sample grids every
5k, checkpoints every 10k + on Ctrl-C, auto-resume from the latest checkpoint.

Run examples:
    python train_mnist.py --epochs 10
    python train_mnist.py --max_steps 50 --log_dir /tmp/mnist_run   # smoke test
    python train_mnist.py --adaptive                                 # closed loop
"""

from __future__ import annotations

import argparse
import os

import jax

from blurred_gan_tpu.runtime import enable_fast_prng, maybe_initialize_distributed

enable_fast_prng()
maybe_initialize_distributed()

from blurred_gan_tpu.data import load_mnist
from blurred_gan_tpu.metrics import FIDMetric, SWDMetric
from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
from blurred_gan_tpu.sched.blur import AdaptiveBlurController, BlurDecayController
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    MetricFeeder,
    Trainer,
    TrainerConfig,
    TrainingConfig,
)


def make_mesh():
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    from jax.sharding import Mesh
    import numpy as np

    return Mesh(np.array(devices), ("data",))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    BlurredWGANGPHyperParameters.add_arguments(parser)
    TrainingConfig.add_arguments(parser)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="cap steps this invocation (smoke tests)")
    parser.add_argument("--adaptive", action="store_true",
                        help="use the closed-loop adaptive blur controller")
    parser.add_argument("--mnist_path", type=str, default=None)
    parser.add_argument("--inception_fid", action="store_true",
                        help="score FID on the InceptionV3 pool3 trunk "
                             "(local weights via $INCEPTION_WEIGHTS or "
                             "$DATASETS_DIR/inception_v3.npz; the reference's "
                             "metric, demo_mnist.py:175) instead of the "
                             "fixed-seed random-conv extractor")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--run_name", type=str, default=None,
                        help="create an auto-numbered results/NN-<name> run dir"
                             " (utils.py:14-24 capability); overrides"
                             " --log_dir")
    parser.add_argument("--device_resident", action="store_true",
                        help="park the dataset in HBM and scan many steps per"
                             " dispatch (full device rate; SWD/FID cadence"
                             " measured at chunk boundaries)")
    parser.add_argument("--chunk_steps", type=int, default=100)
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
    # Data parallelism: global batch = per-replica batch × replica count
    # (demo_mnist.py:119-124 contract).
    n_dev = max(len(jax.devices()), 1)
    hparams.global_batch_size = hparams.batch_size * n_dev

    dataset = load_mnist(path=args.mnist_path)
    total_examples = dataset.num_examples * args.epochs

    gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
    blur_ctrl = adaptive = None
    if args.adaptive:
        adaptive = AdaptiveBlurController(max_value=hparams.initial_blur_std
                                          if hparams.initial_blur_std > 1
                                          else 23.5)
    else:
        # max_value from initial_blur_std, as demo_mnist.py:199 wires it.
        blur_ctrl = BlurDecayController(
            total_n_training_examples=total_examples,
            max_value=hparams.initial_blur_std)

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
            device_fetch_timeout_s=args.fetch_timeout_s,
            seed=args.seed),
        mesh=make_mesh(),
        blur_controller=blur_ctrl,
        adaptive_controller=adaptive,
        metric_feeders=feeders,
        config_sidecars={"hparams": hparams, "config": config},
    )
    print(f"[train_mnist] devices={n_dev} global_bs={hparams.global_batch_size} "
          f"dataset={dataset.name} total_examples={total_examples}")
    if args.device_resident:
        # Progress quantises to whole chunks: shrink the chunk if --max_steps
        # is smaller than one, and round the chunk count UP so at least
        # max_steps run (a floor would silently drop the remainder — e.g.
        # 150 steps at chunk 100 would run only 100).
        chunk_steps = args.chunk_steps
        max_chunks = None
        if args.max_steps is not None:
            chunk_steps = min(chunk_steps, args.max_steps)
            max_chunks = -(-args.max_steps // chunk_steps)
            if args.max_steps % chunk_steps:
                print(f"[train_mnist] --max_steps {args.max_steps} rounds up "
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
