"""Data pipeline.

The reference streams CelebA 64x64 through Fuel HDF5 (`train_IAN.py:357-374`,
`:415,441`) and loads a validation .npz for the editor (`NPE.py:44`). Neither
artifact ships with the reference mount (SURVEY.md global facts), so this
module provides:

  * `NpzImageDataset` -- any (N, 3, 64, 64) uint8 .npz (e.g. a converted
    CelebA, or the editor's CelebAValid.npz);
  * `SyntheticFaces`  -- a deterministic procedural face-like dataset
    (colored blobs on gradients) so training / tests / benchmarks run
    hermetically;
  * `data_loader`     -- the reference's chunked generator contract: yields
    float32 chunks of batch_size*batches_per_chunk images in [-1, 1], with
    per-epoch seeded shuffling and the alternating half-batch offset trick
    (`train_IAN.py:436-443`).
"""

import os

import numpy as np

from npe_tpu.utils.ranges import to_tanh


class SyntheticFaces:
    """Deterministic procedural 64x64 'faces': an oval skin blob, two eyes,
    a mouth, on a colored background. Enough structure for an autoencoder
    to learn, fully hermetic, seeded per index."""

    def __init__(self, num_examples=4096, size=64, seed=7):
        self.num_examples = num_examples
        self.size = size
        self.seed = seed

    def _one(self, idx):
        rng = np.random.RandomState(self.seed * 1000003 + idx)
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        img = np.zeros((3, s, s), np.float32)
        # background gradient
        bg = rng.rand(3, 2).astype(np.float32)
        for c in range(3):
            img[c] = bg[c, 0] * (1 - yy) + bg[c, 1] * yy
        # face oval
        cx, cy = 0.5 + 0.1 * (rng.rand() - 0.5), 0.5 + 0.1 * (rng.rand() - 0.5)
        rx, ry = 0.28 + 0.08 * rng.rand(), 0.36 + 0.08 * rng.rand()
        oval = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1.0
        skin = 0.55 + 0.3 * rng.rand(3).astype(np.float32)
        skin[2] *= 0.8
        for c in range(3):
            img[c] = np.where(oval, skin[c], img[c])
        # eyes
        for ex in (cx - 0.12, cx + 0.12):
            eye = ((xx - ex) / 0.045) ** 2 + ((yy - (cy - 0.08)) / 0.03) ** 2 < 1.0
            for c in range(3):
                img[c] = np.where(eye, 0.1 + 0.1 * rng.rand(), img[c])
        # mouth
        mouth = ((xx - cx) / 0.12) ** 2 + ((yy - (cy + 0.18)) / 0.035) ** 2 < 1.0
        img[0] = np.where(mouth, 0.6 + 0.3 * rng.rand(), img[0])
        img[1] = np.where(mouth, 0.2, img[1])
        img[2] = np.where(mouth, 0.25, img[2])
        return np.uint8(np.clip(img * 255, 0, 255))

    def get_data(self, indices):
        return np.stack([self._one(int(i)) for i in indices])


class RealPhotos64:
    """Real-photograph 64x64 dataset: deterministic seeded random crops
    (scale + flip jitter) from a pool of source photos. The reference trains
    on CelebA via Fuel HDF5 (`train_IAN.py:415,441`), which cannot be
    downloaded in this environment -- this class provides REAL natural-image
    statistics (textures, edges, faces) from photos bundled with the Python
    distribution (matplotlib's grace_hopper portrait, sklearn's china/flower)
    or from any user-supplied directory of images (`source_dir=`), e.g. an
    unpacked CelebA.

    Crop protocol per index: pick a source photo, a scale in [0.2, 0.9] of
    the short side, a position, and a horizontal flip -- all from a
    RandomState seeded by the index, so the dataset is fully deterministic
    and random-access (get_data(indices) contract)."""

    def __init__(self, num_examples=8192, size=64, seed=11, source_dir=None):
        self.num_examples = num_examples
        self.size = size
        self.seed = seed
        self._photos = self._load_sources(source_dir)

    @staticmethod
    def _load_sources(source_dir):
        from PIL import Image

        photos = []
        if source_dir:
            import glob

            paths = sorted(
                p
                for pat in ("*.jpg", "*.jpeg", "*.png", "*.bmp")
                for p in glob.glob(os.path.join(source_dir, pat))
            )
            for p in paths:
                photos.append(np.asarray(Image.open(p).convert("RGB")))
        else:
            import matplotlib

            mpl_sample = os.path.join(matplotlib.get_data_path(), "sample_data")
            for name in ("grace_hopper.jpg",):
                p = os.path.join(mpl_sample, name)
                if os.path.isfile(p):
                    photos.append(np.asarray(Image.open(p).convert("RGB")))
            try:
                from sklearn.datasets import load_sample_images

                photos.extend(np.asarray(im, np.uint8) for im in load_sample_images().images)
            except Exception:
                pass
        if not photos:
            raise FileNotFoundError("RealPhotos64: no source photos found")
        return photos

    def _one(self, idx):
        from PIL import Image

        rng = np.random.RandomState(self.seed * 2654435761 % (2**31) + idx)
        photo = self._photos[rng.randint(len(self._photos))]
        h, w = photo.shape[:2]
        crop = int(min(h, w) * rng.uniform(0.2, 0.9))
        y0 = rng.randint(h - crop + 1)
        x0 = rng.randint(w - crop + 1)
        patch = photo[y0 : y0 + crop, x0 : x0 + crop]
        if rng.rand() < 0.5:
            patch = patch[:, ::-1]
        im = Image.fromarray(patch).resize((self.size, self.size), Image.BILINEAR)
        return np.asarray(im, np.uint8).transpose(2, 0, 1)  # CHW

    def get_data(self, indices):
        return np.stack([self._one(int(i)) for i in indices])


class NpzImageDataset:
    """(N, 3, H, W) uint8 images from an .npz (key 'arr_0', like the
    reference's CelebAValid.npz, `NPE.py:44`)."""

    def __init__(self, path, key="arr_0"):
        self._data = np.load(path)[key]
        self.num_examples = len(self._data)

    def get_data(self, indices):
        return self._data[np.asarray(indices)]


def data_loader(cfg, dataset, offset=0, shuffle=False, seed=42, raw=False):
    """Chunk generator (reference `train_IAN.py:357-374`): yields
    to_tanh(float32) arrays of shape (chunk, 3, 64, 64); with raw=True the
    chunks stay uint8 so the range conversion happens ON DEVICE
    (ops.pallas.staging.stage_chunk) and the host ships 4x fewer bytes."""
    chunk_size = cfg["batch_size"] * cfg["batches_per_chunk"]
    rng = np.random.RandomState(seed)
    n = dataset.num_examples - offset
    index = rng.permutation(n) if shuffle else np.arange(n)
    for i in range(n // chunk_size):
        sel = index[chunk_size * i : chunk_size * (i + 1)] + offset
        data = dataset.get_data(sel)
        yield np.uint8(data) if raw else to_tanh(np.float32(data))


class Hdf5ImageDataset:
    """Fuel-style HDF5 dataset (the reference streams CelebA via Fuel's
    `celeba_64.hdf5`, `train_IAN.py:415,441`): a `features` dataset of
    (N, 3, 64, 64) uint8, optionally windowed by a split range so
    train/valid/test subsets can be selected."""

    def __init__(self, path, source="features", start=0, stop=None):
        import h5py

        self._f = h5py.File(path, "r")
        self._d = self._f[source]
        self._start = start
        stop = stop if stop is not None else self._d.shape[0]
        self.num_examples = stop - start

    def get_data(self, indices):
        import numpy as _np

        idx = _np.asarray(indices) + self._start
        order = _np.argsort(idx)  # h5py requires increasing indices
        out = self._d[_np.sort(idx).tolist()]
        inv = _np.empty_like(order)
        inv[order] = _np.arange(len(order))
        return out[inv]


def get_dataset(spec, num_examples=4096):
    """'synthetic', 'real' (bundled-photo crops), 'real:<dir>' (crops from a
    directory of images), a path to an .npz, or an .hdf5/.h5 (Fuel CelebA
    layout); hdf5 specs accept 'file.hdf5:start:stop' split windows."""
    if spec in (None, "synthetic"):
        return SyntheticFaces(num_examples=num_examples)
    s = str(spec)
    if s == "real" or s.startswith("real:"):
        src = s[len("real:"):] or None if s.startswith("real:") else None
        return RealPhotos64(num_examples=num_examples, source_dir=src)
    if ".hdf5" in s or ".h5" in s:
        parts = s.split(":")
        path = parts[0]
        start = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        stop = int(parts[2]) if len(parts) > 2 and parts[2] else None
        return Hdf5ImageDataset(path, start=start, stop=stop)
    return NpzImageDataset(s)
