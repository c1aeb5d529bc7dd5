"""Measure the TF reference's training throughput — baseline creation.

The reference (lebrice/blurred-GAN) publishes no numbers (BASELINE.md), so this
harness *runs the reference itself* (read-only import from /root/reference) and
times its ``train_on_batch`` on the blurred WGAN-GP configs. The reference's
missing third-party deps (``simple_parsing``, ``tensorflow_hub``, the TF-1.x-era
``AutoTrackable`` import path) are stubbed — none of them are on the hot path.

Usage: ``python benchmarks/reference_baseline.py [--config mnist|celeba128]``
Prints one JSON line per config:
    {"config": ..., "images_per_sec": ..., "ms_per_step": ..., "device": ...}

Measured 2026-08-16 in this container (no GPU; TF 2.21 oneDNN CPU):
    mnist-28  b32: 90.6 images/sec (353 ms/step)
    celeba-128 b32: 8.2 images/sec (3916 ms/step)
These are the denominators recorded in BASELINE.md and bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

import numpy as np


def _install_stubs() -> None:
    sp = types.ModuleType("simple_parsing")

    class _PFC:
        @classmethod
        def add_arguments(cls, parser):
            pass

        @classmethod
        def from_args(cls, args):
            return cls()

    sp.ParseableFromCommandLine = _PFC
    sys.modules.setdefault("simple_parsing", sp)

    hub = types.ModuleType("tensorflow_hub")
    hub.KerasLayer = lambda *a, **k: None
    sys.modules.setdefault("tensorflow_hub", hub)

    trk = types.ModuleType("tensorflow.python.training.tracking.tracking")

    class AutoTrackable:  # the reference only subclasses it (utils.py:138)
        pass

    trk.AutoTrackable = AutoTrackable
    sys.modules.setdefault("tensorflow.python.training.tracking",
                           types.ModuleType(
                               "tensorflow.python.training.tracking"))
    sys.modules.setdefault(
        "tensorflow.python.training.tracking.tracking", trk)


def build_reference_gan(config: str, log_dir: str):
    """Reference BlurredWGANGP with the demo architectures
    (demo_mnist.py:48-86 / demo_celeba.py:51-124), built via tf.keras."""
    import tensorflow as tf
    import wgan as ref_wgan
    import blurred_gan as ref_bg

    L = tf.keras.layers
    if config == "mnist":
        gen = tf.keras.Sequential([
            L.Dense(7 * 7 * 256, use_bias=False, input_shape=(100,)),
            L.BatchNormalization(), L.LeakyReLU(), L.Reshape((7, 7, 256)),
            L.Conv2DTranspose(128, 5, 1, "same", use_bias=False),
            L.BatchNormalization(), L.LeakyReLU(),
            L.Conv2DTranspose(64, 5, 2, "same", use_bias=False),
            L.BatchNormalization(), L.LeakyReLU(),
            L.Conv2DTranspose(1, 5, 2, "same", use_bias=False,
                              activation="tanh"),
        ])
        disc = tf.keras.Sequential([
            L.Conv2D(64, 5, 2, "same", input_shape=(28, 28, 1)),
            L.LeakyReLU(), L.Dropout(0.3),
            L.Conv2D(128, 5, 2, "same"), L.LeakyReLU(), L.Dropout(0.3),
            L.Flatten(), L.Dense(1),
        ])
        shape = (28, 28, 1)
    elif config == "celeba64":
        # The reference only ships the 128^2 CelebA pair; this is the same
        # construction rule with one fewer stage on each side — exactly what
        # this repo's model zoo produces at resolution=64
        # (blurred_gan_tpu/models/dcgan.py celeba_generator/discriminator),
        # so the two frameworks train identical architectures head-to-head.
        gen = tf.keras.Sequential([
            L.Dense(4 * 4 * 512, use_bias=False, input_shape=(100,)),
            L.BatchNormalization(), L.LeakyReLU(), L.Reshape((4, 4, 512)),
            *[l for ch, s in [(512, 1), (256, 2), (128, 2), (64, 2),
                              (32, 2)]
              for l in (L.Conv2DTranspose(ch, 5, s, "same", use_bias=False),
                        L.BatchNormalization(), L.LeakyReLU())],
            L.Conv2D(3, 5, 1, "same", use_bias=False, activation="tanh"),
        ])
        disc = tf.keras.Sequential([
            L.Conv2D(32, 5, 2, "same", input_shape=(64, 64, 3)),
            L.LeakyReLU(), L.Dropout(0.3),
            *[l for ch in (64, 128, 256, 512)
              for l in (L.Conv2D(ch, 5, 2, "same"), L.LeakyReLU(),
                        L.Dropout(0.3))],
            L.Flatten(), L.Dense(1),
        ])
        shape = (64, 64, 3)
    elif config == "celeba128":
        gen = tf.keras.Sequential([
            L.Dense(4 * 4 * 512, use_bias=False, input_shape=(100,)),
            L.BatchNormalization(), L.LeakyReLU(), L.Reshape((4, 4, 512)),
            *[l for ch, s in [(512, 1), (256, 2), (128, 2), (64, 2),
                              (32, 2), (16, 2)]
              for l in (L.Conv2DTranspose(ch, 5, s, "same", use_bias=False),
                        L.BatchNormalization(), L.LeakyReLU())],
            L.Conv2D(3, 5, 1, "same", use_bias=False, activation="tanh"),
        ])
        disc = tf.keras.Sequential([
            L.Conv2D(16, 5, 2, "same", input_shape=(128, 128, 3)),
            L.LeakyReLU(), L.Dropout(0.3),
            *[l for ch in (32, 64, 128, 256, 512)
              for l in (L.Conv2D(ch, 5, 2, "same"), L.LeakyReLU(),
                        L.Dropout(0.3))],
            L.Flatten(), L.Dense(1),
        ])
        shape = (128, 128, 3)
    else:
        raise ValueError(config)

    hp = ref_bg.BlurredWGANGP.HyperParameters()
    cfg = ref_wgan.TrainingConfig(log_dir=log_dir,
                                  checkpoint_dir=log_dir + "/ckpt")
    return ref_bg.BlurredWGANGP(gen, disc, hyperparams=hp, config=cfg), shape


def measure(config: str, batch: int = 32, steps: int = 5,
            warmup: int = 3) -> dict:
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    gan, shape = build_reference_gan(config, f"/tmp/ref_baseline_{config}")
    x = tf.convert_to_tensor(
        (np.random.RandomState(0).rand(batch, *shape).astype(np.float32)
         * 2 - 1))
    for _ in range(warmup):
        gan.train_on_batch(x)
    t0 = time.time()
    for _ in range(steps):
        gan.train_on_batch(x)
    dt = time.time() - t0
    return {
        "config": config,
        "framework": "reference-tf",
        "device": "cpu",
        "batch": batch,
        "images_per_sec": round(steps * batch / dt, 2),
        "ms_per_step": round(dt / steps * 1000, 1),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="all",
                   choices=["mnist", "celeba64", "celeba128", "all"])
    args = p.parse_args()
    configs = (["mnist", "celeba128"] if args.config == "all"
               else [args.config])
    for c in configs:
        print(json.dumps(measure(c)))
