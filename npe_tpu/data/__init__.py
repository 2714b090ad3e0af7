from npe_tpu.data.datasets import (  # noqa: F401
    NpzImageDataset,
    RealPhotos64,
    SyntheticFaces,
    data_loader,
    get_dataset,
)
