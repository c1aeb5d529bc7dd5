from blurred_gan_tpu.ops.blur import (
    appropriate_kernel_size,
    appropriate_std,
    maximum_reasonable_std,
    gaussian_kernel_1d,
    effective_blur_params,
    blur_matrix,
    blur_images,
    gaussian_blur_depthwise,
)

__all__ = [
    "appropriate_kernel_size",
    "appropriate_std",
    "maximum_reasonable_std",
    "gaussian_kernel_1d",
    "effective_blur_params",
    "blur_matrix",
    "blur_images",
    "gaussian_blur_depthwise",
]
