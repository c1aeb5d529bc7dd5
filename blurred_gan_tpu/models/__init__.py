from blurred_gan_tpu.models.layers import GaussianBlur
from blurred_gan_tpu.models.dcgan import (
    DCGANGenerator,
    DCGANDiscriminator,
    mnist_generator,
    mnist_discriminator,
    celeba_generator,
    celeba_discriminator,
)

__all__ = [
    "GaussianBlur",
    "DCGANGenerator",
    "DCGANDiscriminator",
    "mnist_generator",
    "mnist_discriminator",
    "celeba_generator",
    "celeba_discriminator",
]
