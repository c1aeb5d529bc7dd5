from blurred_gan_tpu.models.dcgan import (
    DCGANGenerator,
    DCGANDiscriminator,
    mnist_generator,
    mnist_discriminator,
    celeba_generator,
    celeba_discriminator,
)

__all__ = [
    "DCGANGenerator",
    "DCGANDiscriminator",
    "mnist_generator",
    "mnist_discriminator",
    "celeba_generator",
    "celeba_discriminator",
]
