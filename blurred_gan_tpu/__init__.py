"""blurred_gan_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of lebrice/blurred-GAN.

The reference (/root/reference) trains WGAN / WGAN-GP image generators whose
discriminator input passes through a Gaussian blur with a standard deviation that is
decayed over training (a continuous-resolution alternative to ProGAN's progressive
growing), with SWD and FID evaluation, TensorBoard observability, dataclass CLI config
and checkpoint/resume.

This package rebuilds every one of those capabilities TPU-first:

- ``ops.blur``        separable Gaussian blur as *banded matmuls on the MXU*
                      (σ is a traced scalar — the blur schedule never recompiles);
                      Pallas fused kernel in ``ops.blur_pallas``.
- ``models.dcgan``    DCGAN generator/discriminator pairs (MNIST 28x28, CelebA 64/128).
- ``losses.wgan``     WGAN / WGAN-GP losses incl. the gradient-penalty double backward.
- ``train``           pure-functional TrainState + one jitted train step sharded over a
                      ``jax.sharding.Mesh``; host driver loop with example-count hooks.
- ``sched.blur``      open-loop exponential decay + closed-loop adaptive σ controllers.
- ``metrics``         on-device Laplacian-pyramid SWD and streaming FID.
- ``data``            host pipeline (uint8 to device, normalize on-chip) with MNIST /
                      CelebA / synthetic sources.
- ``utils``           dataclass CLI config, JSON round-trip, run dirs, image grids,
                      TensorBoard + JSONL observability.
"""

__version__ = "0.4.0"
