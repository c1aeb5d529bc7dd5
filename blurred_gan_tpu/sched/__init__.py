from blurred_gan_tpu.sched.blur import (
    ExponentialDecaySchedule,
    BlurDecayController,
    AdaptiveBlurController,
    AdaptiveBlurState,
)

__all__ = [
    "ExponentialDecaySchedule",
    "BlurDecayController",
    "AdaptiveBlurController",
    "AdaptiveBlurState",
]
