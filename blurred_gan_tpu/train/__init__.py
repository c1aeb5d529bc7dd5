from blurred_gan_tpu.train.config import (
    TrainingConfig,
    WGANHyperParameters,
    WGANGPHyperParameters,
    BlurredWGANGPHyperParameters,
)
from blurred_gan_tpu.train.state import (TrainState, GAN, create_train_state,
                                         wide_counter, wide_add, wide_value)
from blurred_gan_tpu.train.step import make_train_step, make_sample_fn
from blurred_gan_tpu.train.hooks import EveryNExamples, HookList
from blurred_gan_tpu.train.checkpoint import (
    CheckpointManager,
    save_on_interrupt,
    save_sidecars,
    load_sidecar,
)
from blurred_gan_tpu.train.loop import Trainer, TrainerConfig, MetricFeeder
from blurred_gan_tpu.train.fast import (
    AdaptiveState,
    adaptive_update,
    chunk_indices,
    make_chunked_train_fn,
)

__all__ = [
    "EveryNExamples",
    "HookList",
    "CheckpointManager",
    "save_on_interrupt",
    "save_sidecars",
    "load_sidecar",
    "Trainer",
    "TrainerConfig",
    "MetricFeeder",
    "AdaptiveState",
    "adaptive_update",
    "chunk_indices",
    "make_chunked_train_fn",
    "TrainingConfig",
    "WGANHyperParameters",
    "WGANGPHyperParameters",
    "BlurredWGANGPHyperParameters",
    "TrainState",
    "GAN",
    "create_train_state",
    "wide_counter",
    "wide_add",
    "wide_value",
    "make_train_step",
    "make_sample_fn",
]
