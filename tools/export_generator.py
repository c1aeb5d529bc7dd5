"""Export a trained generator checkpoint as a portable StableHLO serving
artifact (see blurred_gan_tpu/serving.py; deployment counterpart of the
reference's save_weights split, /root/reference/wgan.py:229-231).

    python tools/export_generator.py --log_dir results/01-mnist \
        --dataset mnist --out generator.jaxexport
    python tools/export_generator.py --log_dir results/02-celeba \
        --dataset celeba --resolution 128 --ema --platforms tpu,cpu \
        --out generator.jaxexport

Serve it from any JAX process, no framework import needed:

    from jax import export
    exported = export.deserialize(open("generator.jaxexport", "rb").read())
    images = exported.call(latents)   # (B, latent_size) float32, any B
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

# Runnable as `python tools/export_generator.py` from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--dataset", choices=["mnist", "celeba"], default=None,
                   help="model family; default: inferred from the run's "
                        "run_manifest.json (1-channel → mnist, 3 → celeba)")
    p.add_argument("--resolution", type=int, default=None,
                   help="celeba resolution (must match the trained model; "
                        "default: inferred from run_manifest.json)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--ema", action="store_true",
                   help="bake the EMA generator weights")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (e.g. tpu,cpu); "
                        "default = current backend only")
    p.add_argument("--verify_batches", default="1,7",
                   help="batch sizes round-tripped through the artifact "
                        "against the live generator ('' skips)")
    args = p.parse_args()

    from blurred_gan_tpu.models import (celeba_discriminator, celeba_generator,
                                        mnist_discriminator, mnist_generator)
    from blurred_gan_tpu.serving import export_generator, load_generator
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       CheckpointManager, create_train_state)
    from blurred_gan_tpu.train.checkpoint import load_sidecar
    from blurred_gan_tpu.utils.rundir import resolve_model_identity

    args.dataset, args.resolution = resolve_model_identity(
        args.log_dir, args.dataset, args.resolution)
    if args.dataset == "mnist":
        gan = GAN(mnist_generator(), mnist_discriminator(), blurred=True)
        shape = (28, 28, 1)
    else:
        gan = GAN(celeba_generator(args.resolution),
                  celeba_discriminator(args.resolution), blurred=True)
        shape = (args.resolution, args.resolution, 3)

    hp = (load_sidecar(args.log_dir, BlurredWGANGPHyperParameters,
                       "hyper_parameters.json")
          or BlurredWGANGPHyperParameters())
    template = create_train_state(gan, hp, jax.random.PRNGKey(0), shape)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    try:
        restored = ckpt.restore_latest(template)
    except Exception as e:  # Orbax structure mismatch reads as gibberish —
        # the usual cause is a --dataset/--resolution that doesn't match
        # the trained model; say so before the raw error.
        raise SystemExit(
            f"checkpoint restore failed for a {args.dataset}"
            f"@{args.resolution} model — if this run was trained with a "
            f"different --dataset/--resolution, pass the matching ones "
            f"(original error: {type(e).__name__}: {e})") from e
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, _, step = restored
    ckpt.close()
    print(f"restored checkpoint @ {step} examples")

    platforms = (args.platforms.split(",") if args.platforms else None)
    blob = export_generator(gan, state, use_ema=args.ema,
                            platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)/1e6:.2f} MB, "
          f"platforms={platforms or [jax.default_backend()]}, "
          f"weights={'ema' if args.ema else 'live'})")

    batches = [int(b) for b in args.verify_batches.split(",") if b]
    if batches:
        serve = load_generator(args.out)
        for bsz in batches:
            z = gan.sample_latents(jax.random.PRNGKey(123), bsz)
            got = np.asarray(serve(z))
            params = state.g_ema if args.ema else state.g_params
            want, _ = gan.generate(params, state.g_stats, z, train=False)
            np.testing.assert_allclose(got, np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
            print(f"verified batch {bsz}: artifact == live generator "
                  f"(shape {got.shape})")


if __name__ == "__main__":
    sys.exit(main())
