from npe_tpu.data.datasets import SyntheticFaces, NpzImageDataset, data_loader, get_dataset  # noqa: F401
