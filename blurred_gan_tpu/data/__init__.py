from blurred_gan_tpu.data.pipeline import (
    ArrayDataset,
    DataPipeline,
    image_folder_dataset,
    load_mnist,
    load_celeba,
    synthetic_dataset,
)

__all__ = [
    "ArrayDataset",
    "DataPipeline",
    "image_folder_dataset",
    "load_mnist",
    "load_celeba",
    "synthetic_dataset",
]
