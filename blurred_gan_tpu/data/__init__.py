from blurred_gan_tpu.data.pipeline import (
    ArrayDataset,
    DataPipeline,
    ShardedArrayDataset,
    image_folder_dataset,
    load_mnist,
    load_celeba,
    synthetic_dataset,
    write_shards,
)

__all__ = [
    "ArrayDataset",
    "DataPipeline",
    "ShardedArrayDataset",
    "image_folder_dataset",
    "load_mnist",
    "load_celeba",
    "synthetic_dataset",
    "write_shards",
]
