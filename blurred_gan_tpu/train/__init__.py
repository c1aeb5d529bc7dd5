from blurred_gan_tpu.train.config import (
    TrainingConfig,
    WGANHyperParameters,
    WGANGPHyperParameters,
    BlurredWGANGPHyperParameters,
)
from blurred_gan_tpu.train.state import TrainState, GAN, create_train_state
from blurred_gan_tpu.train.step import make_train_step, make_sample_fn

__all__ = [
    "TrainingConfig",
    "WGANHyperParameters",
    "WGANGPHyperParameters",
    "BlurredWGANGPHyperParameters",
    "TrainState",
    "GAN",
    "create_train_state",
    "make_train_step",
    "make_sample_fn",
]
