from blurred_gan_tpu.metrics.swd import (
    SWDMetric,
    laplacian_pyramid,
    reconstruct_laplacian_pyramid,
    pyr_down,
    pyr_up,
    patch_descriptors,
    finalize_descriptors,
    sliced_wasserstein_distance,
    swd_resolutions,
)
from blurred_gan_tpu.metrics.fid import (
    FIDMetric,
    frechet_distance,
    FeatureStats,
    random_conv_features,
)

__all__ = [
    "SWDMetric",
    "laplacian_pyramid",
    "reconstruct_laplacian_pyramid",
    "pyr_down",
    "pyr_up",
    "patch_descriptors",
    "finalize_descriptors",
    "sliced_wasserstein_distance",
    "swd_resolutions",
    "FIDMetric",
    "frechet_distance",
    "FeatureStats",
    "random_conv_features",
]
