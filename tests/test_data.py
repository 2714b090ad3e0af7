"""Data pipeline tests: loaders, datasets, offset trick, hdf5."""

import numpy as np
import pytest

from npe_tpu.data import SyntheticFaces, data_loader, get_dataset


def test_synthetic_deterministic():
    ds = SyntheticFaces(num_examples=8, size=32)
    a = ds.get_data([0, 3])
    b = ds.get_data([0, 3])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 3, 32, 32)
    assert a.dtype == np.uint8
    assert not np.array_equal(a[0], a[1])


def test_data_loader_contract():
    ds = SyntheticFaces(num_examples=64, size=16)
    cfg = {"batch_size": 8, "batches_per_chunk": 2}
    chunks = list(data_loader(cfg, ds, shuffle=True, seed=3))
    assert len(chunks) == 4
    assert chunks[0].shape == (16, 3, 16, 16)
    assert chunks[0].dtype == np.float32
    assert chunks[0].min() >= -1 and chunks[0].max() <= 1
    # seeded shuffle is reproducible
    again = list(data_loader(cfg, ds, shuffle=True, seed=3))
    np.testing.assert_array_equal(chunks[0], again[0])


def test_data_loader_offset_window():
    ds = SyntheticFaces(num_examples=64, size=16)
    cfg = {"batch_size": 8, "batches_per_chunk": 2}
    base = next(iter(data_loader(cfg, ds, offset=4)))
    direct = 2.0 * (np.float32(ds.get_data(range(4, 20))) / 255.0) - 1.0
    np.testing.assert_allclose(base, direct, rtol=1e-6)


def test_hdf5_dataset(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "celeba_64.hdf5")
    data = np.random.RandomState(0).randint(0, 256, (20, 3, 8, 8), dtype=np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("features", data=data)
    ds = get_dataset(path + ":5:15")
    assert ds.num_examples == 10
    out = ds.get_data([3, 0, 7])  # unsorted indices must work
    np.testing.assert_array_equal(out, data[[8, 5, 12]])


def test_get_dataset_npz(tmp_path):
    path = str(tmp_path / "valid.npz")
    data = np.random.RandomState(1).randint(0, 256, (6, 3, 8, 8), dtype=np.uint8)
    np.savez(path, data)
    ds = get_dataset(path)
    assert ds.num_examples == 6
    np.testing.assert_array_equal(ds.get_data([2]), data[2:3])
