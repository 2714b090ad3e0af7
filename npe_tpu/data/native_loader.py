"""ctypes bindings for the native C++ chunk loader (native/loader.cpp).

Build-on-demand: compiles the shared library with g++ on first use and
caches it next to the source. Falls back cleanly (raises ImportError) when
no compiler is available so callers can use the Python loader instead.

Usage mirrors `data.data_loader` but streams from an mmap'ed raw uint8
record file with a background prefetch thread:

    export_raw(dataset, "train.raw")          # one-time conversion
    for chunk in native_chunk_loader(cfg, "train.raw", num, shuffle=True,
                                     seed=epoch, offset=off):
        ...  # float32 (chunk, 3, 64, 64) in [-1, 1]
"""

import ctypes
import os
import subprocess

import numpy as np

from npe_tpu.utils.ranges import to_tanh

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "loader.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libnpeloader.so"))

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.npe_loader_open.restype = ctypes.c_void_p
    lib.npe_loader_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.npe_loader_begin_epoch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int64,
    ]
    lib.npe_loader_chunks_per_epoch.restype = ctypes.c_int64
    lib.npe_loader_chunks_per_epoch.argtypes = [ctypes.c_void_p]
    lib.npe_loader_next.restype = ctypes.c_int64
    lib.npe_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.npe_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def export_raw(dataset, path, batch=256):
    """Write any dataset (get_data/num_examples interface) to a raw uint8
    record file; returns (num_records, record_shape)."""
    first = np.asarray(dataset.get_data([0]))
    shape = first.shape[1:]
    with open(path, "wb") as f:
        for start in range(0, dataset.num_examples, batch):
            idx = range(start, min(start + batch, dataset.num_examples))
            f.write(np.ascontiguousarray(np.uint8(dataset.get_data(list(idx)))).tobytes())
    return dataset.num_examples, shape


class NativeChunkLoader:
    """RAII handle over the C loader."""

    def __init__(self, path, num_records, record_shape, chunk_records, n_prefetch=2):
        self.lib = get_lib()
        self.record_shape = tuple(record_shape)
        self.record_bytes = int(np.prod(record_shape))
        self.chunk_records = chunk_records
        self._h = self.lib.npe_loader_open(
            str(path).encode(), num_records, self.record_bytes, chunk_records, n_prefetch
        )
        if not self._h:
            raise OSError(f"npe_loader_open failed for {path}")
        self._buf = np.empty((chunk_records, *self.record_shape), np.uint8)

    def epoch(self, shuffle=True, seed=0, offset=0):
        self.lib.npe_loader_begin_epoch(self._h, int(bool(shuffle)), seed, offset)
        n_chunks = self.lib.npe_loader_chunks_per_epoch(self._h)
        for _ in range(int(n_chunks)):
            got = self.lib.npe_loader_next(
                self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if got == 0:
                return
            # copy: the internal buffer is reused by the next iteration
            yield self._buf[:got].copy()

    def close(self):
        if getattr(self, "_h", None):
            self.lib.npe_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_chunk_loader(cfg, path, num_records, record_shape=(3, 64, 64), offset=0, shuffle=False, seed=42, loader=None, raw=False):
    """Drop-in for `data.data_loader` backed by the native prefetcher.
    raw=True keeps chunks uint8 for on-device staging (stage_chunk)."""
    chunk = cfg["batch_size"] * cfg["batches_per_chunk"]
    own = loader is None
    if own:
        loader = NativeChunkLoader(path, num_records, record_shape, chunk)
    try:
        for u8 in loader.epoch(shuffle=shuffle, seed=seed, offset=offset):
            yield u8 if raw else to_tanh(np.float32(u8))
    finally:
        if own:
            loader.close()
