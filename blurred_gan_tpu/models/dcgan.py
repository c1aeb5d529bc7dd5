"""DCGAN generator / discriminator pairs (the reference's model zoo).

Capability parity with the demo architectures in the reference
(/root/reference/demo_mnist.py:48-86 and /root/reference/demo_celeba.py:51-124),
expressed as configurable flax.linen modules so one class covers MNIST-28,
CelebA-64 and CelebA-128 (and any power-of-two in between).

TF-default details preserved for parity:
- LeakyReLU slope 0.3 (tf.keras default), not jax's 0.01;
- BatchNorm momentum 0.99, epsilon 1e-3 (tf.keras defaults);
- glorot-uniform kernel init, zero bias (tf.keras defaults);
- generator convs bias-free (``use_bias=False`` throughout the reference G);
- dropout rate 0.3 in the discriminator;
- 5x5 kernels, stride-2 SAME up/down-sampling.

Everything runs in NHWC with parameters in float32; activations may be bfloat16 via
the ``compute_dtype`` field (MXU-friendly) while BN statistics stay float32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

LEAKY_SLOPE = 0.3  # tf.keras.layers.LeakyReLU default
_glorot = nn.initializers.glorot_uniform()


class DCGANGenerator(nn.Module):
    """Dense -> reshape -> [ConvT + BN + LeakyReLU]* -> (ConvT|Conv) tanh.

    MNIST spec (demo_mnist.py:48-71): init (7,7,256); blocks (128,s1),(64,s2);
    final ConvT(1, s2, tanh).
    CelebA-128 spec (demo_celeba.py:51-93): init (4,4,512); blocks (512,s1),
    (256,s2),(128,s2),(64,s2),(32,s2),(16,s2); final Conv(3, s1, tanh).
    """

    latent_size: int = 100
    init_hw: Tuple[int, int] = (4, 4)
    init_features: int = 512
    blocks: Sequence[Tuple[int, int]] = ((512, 1), (256, 2), (128, 2), (64, 2))
    out_channels: int = 3
    final_transpose: bool = False  # MNIST ends with ConvT stride 2; CelebA with Conv.
    final_stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    # Profile-guided fast paths (BASELINE.md round-3 gen-step study). Both
    # preserve the architecture; they only move dtype boundaries:
    # - bn_dtype: BatchNorm *arithmetic* dtype (None -> float32, the tf.keras
    #   default). flax computes the batch statistics in >= float32 regardless,
    #   so bfloat16 here only affects the normalise/scale elementwise pass —
    #   at 128^2 x 16ch that pass is pure HBM traffic and f32 doubles it.
    # - output_f32: cast to float32 *before* the final tanh (reference
    #   semantics). False keeps the image in compute_dtype — the critic
    #   recasts to compute_dtype anyway, so training in bf16 avoids a
    #   25 MB/step f32 round-trip at CelebA-128 b128.
    bn_dtype: jnp.dtype | None = None
    output_f32: bool = True
    # Upsampling operator for the stride-2 stages:
    # - "transpose": ConvTranspose(5x5, s2) — the reference's operator
    #   (demo_celeba.py:66-90). Uneven kernel overlap at k=5/s=2 imprints a
    #   checkerboard prior on whatever part of the spectrum the critic does
    #   not constrain (e.g. everything above the blur cutoff in the
    #   heavy-blur regime; see BASELINE.md's round-4 diagnosis).
    # - "resize": nearest-neighbour 2x + Conv(5x5, s1) — the
    #   resize-convolution of Odena et al. 2016 ("Deconvolution and
    #   Checkerboard Artifacts"); every output pixel sees the same tap
    #   pattern, so the architecture's artifact prior is flat. Beyond-parity
    #   option; TPU-friendly (the 2x repeat is a free relayout fused into the
    #   following MXU conv).
    upsample: str = "transpose"

    @nn.compact
    def __call__(self, z, *, train: bool = False):
        if self.upsample not in ("transpose", "resize"):
            raise ValueError(f"upsample must be 'transpose' or 'resize', "
                             f"got {self.upsample!r}")
        bn_dtype = self.bn_dtype or jnp.float32
        h0, w0 = self.init_hw
        x = nn.Dense(h0 * w0 * self.init_features, use_bias=False,
                     kernel_init=_glorot, dtype=self.compute_dtype)(z)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=bn_dtype)(x)
        x = nn.leaky_relu(x, LEAKY_SLOPE)
        x = x.reshape((x.shape[0], h0, w0, self.init_features))

        def up(x, features, stride):
            if self.upsample == "resize" and stride > 1:
                x = jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)
                return nn.Conv(features, (5, 5), strides=(1, 1),
                               padding="SAME", use_bias=False,
                               kernel_init=_glorot,
                               dtype=self.compute_dtype)(x)
            return nn.ConvTranspose(features, (5, 5),
                                    strides=(stride, stride),
                                    padding="SAME", use_bias=False,
                                    kernel_init=_glorot,
                                    dtype=self.compute_dtype)(x)

        for features, stride in self.blocks:
            x = up(x, features, stride)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=bn_dtype)(x)
            x = nn.leaky_relu(x, LEAKY_SLOPE)
        if self.final_transpose:
            x = up(x, self.out_channels, self.final_stride)
        else:
            x = nn.Conv(self.out_channels, (5, 5),
                        strides=(self.final_stride, self.final_stride),
                        padding="SAME", use_bias=False,
                        kernel_init=_glorot, dtype=self.compute_dtype)(x)
        if self.output_f32:
            return jnp.tanh(x.astype(jnp.float32))
        return jnp.tanh(x)


class DCGANDiscriminator(nn.Module):
    """[Conv s2 + LeakyReLU + Dropout(0.3)]* -> flatten -> Dense(1).

    MNIST spec (demo_mnist.py:74-86): channels (64, 128).
    CelebA-128 spec (demo_celeba.py:96-124): channels (16, 32, 64, 128, 256, 512).
    """

    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dropout_rate: float = 0.3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.compute_dtype)
        for ch in self.channels:
            x = nn.Conv(ch, (5, 5), strides=(2, 2), padding="SAME",
                        kernel_init=_glorot, dtype=self.compute_dtype)(x)
            x = nn.leaky_relu(x, LEAKY_SLOPE)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        return nn.Dense(1, kernel_init=_glorot)(x)


# ---------------------------------------------------------------------------
# Named configurations matching the reference demos
# ---------------------------------------------------------------------------


def mnist_generator(latent_size: int = 100, compute_dtype=jnp.float32,
                    upsample: str = "transpose"):
    """28x28x1 generator (demo_mnist.py:48-71)."""
    return DCGANGenerator(
        latent_size=latent_size, init_hw=(7, 7), init_features=256,
        blocks=((128, 1), (64, 2)), out_channels=1,
        final_transpose=True, final_stride=2, compute_dtype=compute_dtype,
        upsample=upsample)


def mnist_discriminator(compute_dtype=jnp.float32):
    """28x28x1 critic (demo_mnist.py:74-86)."""
    return DCGANDiscriminator(channels=(64, 128), compute_dtype=compute_dtype)


def celeba_generator(resolution: int = 128, latent_size: int = 100,
                     compute_dtype=jnp.float32, bn_dtype=None,
                     output_f32: bool = True, upsample: str = "transpose"):
    """CelebA generator at a power-of-two resolution >= 8.

    At 128 this is exactly demo_celeba.py:51-93 (4x4x512 -> 6 ConvT stages -> Conv
    tanh); smaller resolutions drop trailing stages (config #2 in BASELINE.json uses
    64). ``bn_dtype``/``output_f32``: dtype-boundary fast paths, see
    DCGANGenerator.
    """
    assert resolution >= 8 and (resolution & (resolution - 1)) == 0
    n_up = resolution.bit_length() - 3  # 4 * 2**n_up == resolution
    chans = [512, 256, 128, 64, 32, 16]
    blocks = [(512, 1)] + [(chans[min(i + 1, len(chans) - 1)], 2) for i in range(n_up)]
    return DCGANGenerator(
        latent_size=latent_size, init_hw=(4, 4), init_features=512,
        blocks=tuple(blocks), out_channels=3,
        final_transpose=False, final_stride=1, compute_dtype=compute_dtype,
        bn_dtype=bn_dtype, output_f32=output_f32, upsample=upsample)


def celeba_discriminator(resolution: int = 128, compute_dtype=jnp.float32):
    """CelebA critic; at 128 exactly demo_celeba.py:96-124 (16..512 stride-2)."""
    assert resolution >= 8 and (resolution & (resolution - 1)) == 0
    n_down = resolution.bit_length() - 2  # downsample to 2x2 like the 128 ref (128->2)
    chans = [16, 32, 64, 128, 256, 512]
    channels = tuple(chans[max(0, len(chans) - n_down):]) if n_down < len(chans) \
        else tuple(chans)
    return DCGANDiscriminator(channels=channels, compute_dtype=compute_dtype)
