"""Golden quality trajectories: the reference vs this framework, same corpus,
same σ schedule, same metric stack (VERDICT.md round-1 next #2; the
BASELINE.json north-star "SWD & FID within 5%" measurement).

Three subcommands, designed to run independently (the reference's CPU training
is the long pole and runs in the background):

    python benchmarks/quality_parity.py train_ref  --examples 60000 --out /tmp/qp
    python benchmarks/quality_parity.py train_ours --examples 60000 --out /tmp/qp
    python benchmarks/quality_parity.py evaluate   --out /tmp/qp [--seeds 0,1]

``train_ref`` trains the reference BlurredWGANGP (MNIST-28 demo config,
/root/reference/demo_mnist.py:91-219 semantics) on the SAME deterministic
synthetic corpus the framework's MNIST demo falls back to (no egress in this
container), driving its blur σ with the same open-loop schedule both demos
use (max_value = initial_blur_std, demo_mnist.py:199). ``train_ours`` trains
this framework's MNIST config identically. ``evaluate`` scores each model's
1000 generated samples against the same 1000 held-out-order reals with the
SAME metric implementations (our SWD + our streaming FID with the shared
fixed-seed extractor), plus a reals-vs-reals floor, and prints one JSON line
per row.

Both trainings use their framework's OWN RNG streams (TF vs JAX), so parity
is statistical, not bitwise: run multiple seeds (--seed) for error bars.
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
IMAGE_SHAPE = (28, 28, 1)
CORPUS_N = 60_000  # reference MNIST demo trains on 60k examples/epoch
BATCH = 32
LATENT = 100
N_EVAL = 1000


def _corpus():
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.data.pipeline import synthetic_dataset

    return synthetic_dataset(IMAGE_SHAPE, num_examples=CORPUS_N)


def _sigma_controller(total_examples: int):
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.sched.blur import BlurDecayController

    # demo_mnist.py:199: max_value = initial_blur_std (default 0.05).
    return BlurDecayController(total_n_training_examples=total_examples,
                               max_value=0.05)


def _eval_latents(seed: int = 123) -> np.ndarray:
    # Uniform [0,1) — the latent prior of both frameworks (wgan.py:116-118).
    return np.random.RandomState(seed).rand(N_EVAL, LATENT).astype(np.float32)


def train_ref(examples: int, out: str, seed: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import reference_baseline

    reference_baseline._install_stubs()
    sys.path.insert(0, REF)
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.keras.utils.set_random_seed(seed)
    gan, _ = reference_baseline.build_reference_gan(
        "mnist", os.path.join(out, f"ref_log_s{seed}"))
    ds = _corpus()
    ctrl = _sigma_controller(examples)

    t0 = time.time()
    n_batches = 0
    for batch in ds.batches(BATCH, seed=seed):
        if n_batches * BATCH >= examples:
            break
        sigma = ctrl.sigma(n_batches)
        gan.blur.std.assign(sigma)
        x = tf.convert_to_tensor(batch.astype(np.float32) / 127.5 - 1.0)
        gan.train_on_batch(x)
        n_batches += 1
        if n_batches % 100 == 0:
            rate = n_batches * BATCH / (time.time() - t0)
            print(f"[ref seed{seed}] {n_batches * BATCH}/{examples} examples "
                  f"({rate:.1f} img/s) sigma={sigma:.4f}", flush=True)
    elapsed = time.time() - t0

    latents = _eval_latents()
    samples = np.concatenate(
        [gan.generator(tf.convert_to_tensor(latents[i:i + 100]),
                       training=False).numpy()
         for i in range(0, N_EVAL, 100)])
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, f"ref_samples_s{seed}.npz"), samples=samples)
    meta = {"framework": "reference-tf", "seed": seed, "examples": examples,
            "images_per_sec": round(examples / elapsed, 2),
            "elapsed_s": round(elapsed, 1)}
    with open(os.path.join(out, f"ref_meta_s{seed}.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


def train_ours(examples: int, out: str, seed: int) -> None:
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from blurred_gan_tpu.models import mnist_discriminator, mnist_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       Trainer, TrainerConfig)

    gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
    hp = BlurredWGANGPHyperParameters(batch_size=BATCH,
                                      global_batch_size=BATCH)
    ds = _corpus()
    ctrl = _sigma_controller(examples)
    run_dir = os.path.join(out, f"ours_log_s{seed}")
    tr = Trainer(gan, hp, ds,
                 trainer_config=TrainerConfig(
                     log_dir=run_dir, seed=seed,
                     sample_grid_every_n_examples=0,
                     checkpoint_every_n_examples=0,
                     image_summaries_interval_batches=0),
                 blur_controller=ctrl)
    t0 = time.time()
    state = tr.fit(total_examples=examples)
    elapsed = time.time() - t0

    latents = jnp.asarray(_eval_latents())
    fakes, _ = gan.generate(state.g_params, state.g_stats, latents,
                            train=False)
    samples = np.asarray(fakes)
    tr.close()
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, f"ours_samples_s{seed}.npz"), samples=samples)
    meta = {"framework": "blurred_gan_tpu", "seed": seed,
            "examples": examples, "backend": jax.default_backend(),
            "images_per_sec": round(examples / elapsed, 2),
            "elapsed_s": round(elapsed, 1)}
    with open(os.path.join(out, f"ours_meta_s{seed}.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


def evaluate(out: str, seeds, use_inception: bool) -> None:
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.metrics import FIDMetric, SWDMetric

    ds = _corpus()
    # Held-out-order reals: last N_EVAL of a fixed shuffle (training streams
    # start from the epoch-0 front of per-seed shuffles).
    order = np.random.RandomState(10_000).permutation(ds.num_examples)
    reals = ds.images[order[-N_EVAL:]].astype(np.float32) / 127.5 - 1.0
    reals_b = ds.images[order[:N_EVAL]].astype(np.float32) / 127.5 - 1.0

    feature_fns = {"fid_randconv": None}
    if use_inception:
        from blurred_gan_tpu.metrics import inception_feature_fn

        feature_fns["fid_inception"] = inception_feature_fn(resize_to=75)

    def score(name: str, fakes: np.ndarray) -> dict:
        row = {"samples": name}
        swd = SWDMetric()
        for i in range(0, N_EVAL, 100):
            swd.update_state(reals[i:i + 100], fakes[i:i + 100])
        row.update({k: round(float(v), 3) for k, v in swd.results().items()})
        for fid_name, fn in feature_fns.items():
            fid = FIDMetric(feature_fn=fn)
            for i in range(0, N_EVAL, 100):
                fid.update_state(reals[i:i + 100], fakes[i:i + 100])
            row[fid_name] = round(float(fid.result()), 3)
        print(json.dumps(row), flush=True)
        return row

    rows = {"reals_floor": score("reals_vs_reals", reals_b)}
    for seed in seeds:
        for side in ("ref", "ours"):
            path = os.path.join(out, f"{side}_samples_s{seed}.npz")
            if not os.path.exists(path):
                print(f"[skip] {path} missing", flush=True)
                continue
            with np.load(path) as d:
                rows[f"{side}_s{seed}"] = score(f"{side}_s{seed}",
                                                d["samples"])
    # Relative gaps per seed (the 5% north-star, BASELINE.json).
    for seed in seeds:
        r, o = rows.get(f"ref_s{seed}"), rows.get(f"ours_s{seed}")
        if r and o:
            gaps = {}
            for k in r:
                if not k.lower().startswith(("swd", "fid")):
                    continue
                if r[k] == 0:  # rounded-to-zero reference: gap undefined
                    gaps[k] = f"ref=0 (ours abs {o[k]})"
                else:
                    gaps[k] = round((o[k] - r[k]) / abs(r[k]), 4)
            print(json.dumps({"rel_gap_ours_vs_ref": gaps, "seed": seed}),
                  flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["train_ref", "train_ours", "evaluate"])
    p.add_argument("--examples", type=int, default=60_000)
    p.add_argument("--out", type=str, default="/tmp/quality_parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", type=str, default="0")
    p.add_argument("--inception", action="store_true")
    args = p.parse_args()
    if args.cmd == "train_ref":
        train_ref(args.examples, args.out, args.seed)
    elif args.cmd == "train_ours":
        train_ours(args.examples, args.out, args.seed)
    else:
        evaluate(args.out, [int(s) for s in args.seeds.split(",")],
                 args.inception)
