"""Generate a sample grid from a trained checkpoint (inference entry point).

The reference demos sample the generator after training
(/root/reference/demo_mnist.py:210-218); this is the standalone equivalent:
restore the latest checkpoint from a run directory and write an 8×8 grid PNG.

    python generate_samples.py --log_dir results/01-mnist --dataset mnist
    python generate_samples.py --log_dir results/02-celeba --dataset celeba \
        --resolution 128 --out samples.png --blur_std 0.5
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--dataset", choices=["mnist", "celeba"], default=None,
                   help="model family; default: inferred from the run's "
                        "run_manifest.json (1-channel → mnist, 3 → celeba)")
    p.add_argument("--resolution", type=int, default=None,
                   help="celeba resolution (must match the trained model; "
                        "default: inferred from run_manifest.json)")
    p.add_argument("--out", default=None, help="output PNG path")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--blur_std", type=float, default=None,
                   help="also blur the samples (view as the critic would)")
    p.add_argument("--ema", action="store_true",
                   help="sample from the EMA generator weights (requires a "
                        "run trained with --ema_decay > 0)")
    p.add_argument("--interpolate", action="store_true",
                   help="latent-space interpolation grid instead of random "
                        "samples: each row walks evenly between two random "
                        "latents (linear — the prior is uniform, wgan.py:118; "
                        "smooth rows indicate a well-behaved latent space)")
    p.add_argument("--rows", type=int, default=8,
                   help="interpolation rows (independent endpoint pairs)")
    p.add_argument("--steps", type=int, default=8,
                   help="interpolation steps per row (grid columns)")
    args = p.parse_args()

    from blurred_gan_tpu.models import (celeba_discriminator, celeba_generator,
                                        mnist_discriminator, mnist_generator)
    from blurred_gan_tpu.ops.blur import blur_images
    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       CheckpointManager, create_train_state,
                                       make_sample_fn)
    from blurred_gan_tpu.utils import normalize_images, save_image_grid
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

    from blurred_gan_tpu.train.checkpoint import load_sidecar

    # The run's sidecar hparams (if present) carry ema_decay, so the restore
    # template matches the checkpoint's state layout.
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
    print(f"restored checkpoint @ {step} examples")
    if args.ema and not jax.tree_util.tree_leaves(state.g_ema):
        raise SystemExit("--ema: this run has no EMA weights "
                         "(train with --ema_decay > 0)")

    sample = make_sample_fn(gan, use_ema=args.ema)
    if args.interpolate:
        # R endpoint pairs, S evenly-spaced points each: row r walks from
        # za[r] to zb[r]. Linear interpolation matches the uniform prior.
        z2 = gan.sample_latents(jax.random.PRNGKey(args.seed),
                                2 * args.rows)
        za, zb = z2[:args.rows], z2[args.rows:]
        t = jnp.linspace(0.0, 1.0, args.steps)[None, :, None]
        z = (za[:, None, :] * (1.0 - t)
             + zb[:, None, :] * t).reshape(args.rows * args.steps, -1)
        grid = (args.rows, args.steps)
        default_name = f"{args.log_dir}/interpolate_{step:08d}.png"
    else:
        z = gan.sample_latents(jax.random.PRNGKey(args.seed), args.n)
        side = int(np.ceil(np.sqrt(args.n)))
        grid = (side, side)
        default_name = f"{args.log_dir}/generated_{step:08d}.png"
    imgs = sample(state, z)
    if args.blur_std is not None:
        imgs = blur_images(imgs, jnp.float32(args.blur_std))
    out = args.out or default_name
    save_image_grid(normalize_images(np.asarray(imgs)), out, grid=grid)
    print(f"wrote {out}")
    ckpt.close()


if __name__ == "__main__":
    main()
