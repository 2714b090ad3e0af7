"""Batched inference serving.

The reference has no serving story (a single-process Tk app). For production
deployment the unit of efficiency on TPU is the *batch*: this module
provides a thread-safe micro-batching server that aggregates concurrent
encode/decode requests into fixed-shape batches (one compiled program per
op), pads the tail, and fans results back out to callers.

Design: requests enqueue (op, array, Future); a dispatcher thread drains the
queue, groups by op, pads to `max_batch`, runs the jitted kernel, and
resolves futures. Fixed batch shape = zero recompiles; padding waste is
bounded by max_batch and the configurable linger window.
"""

import queue
import threading
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.models import get_config


class InferenceServer:
    def __init__(
        self,
        config="IAN_simple",
        variables=None,
        weights_path=None,
        max_batch=64,
        linger_ms=2.0,
        dtype=None,
        seed=0,
    ):
        self.module = get_config(config)
        if variables is None:
            variables = self.module.init(jax.random.PRNGKey(seed))
        if weights_path is not None:
            from npe_tpu.utils import checkpoints

            checkpoints.load_weights(weights_path, variables)
        if dtype is not None:
            from npe_tpu.utils.cast import cast_floating

            variables = cast_floating(variables, dtype)
        self.variables = variables
        self.max_batch = max_batch
        self.linger = linger_ms / 1000.0
        mod = self.module
        in_dtype = dtype or jnp.float32

        @jax.jit
        def _encode(v, x):
            return mod.encode(v, x.astype(in_dtype)).astype(jnp.float32)

        @jax.jit
        def _decode(v, z):
            return mod.decode(v, z.astype(in_dtype)).astype(jnp.float32)

        self._kernels = {"encode": _encode, "decode": _decode}
        self._q = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # --- public API ----------------------------------------------------------

    def encode(self, images_nhwc):
        """(n, 64, 64, 3) [-1,1] -> Future of (n, zdim)."""
        return self._submit("encode", np.asarray(images_nhwc, np.float32))

    def decode(self, z):
        """(n, zdim) -> Future of (n, 64, 64, 3)."""
        return self._submit("decode", np.asarray(z, np.float32))

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # --- internals -----------------------------------------------------------

    def _submit(self, op, arr):
        fut = Future()
        self._q.put((op, arr, fut))
        return fut

    def _drain(self, first):
        """Collect compatible requests up to max_batch within the linger
        window."""
        import time

        items = [first]
        total = first[1].shape[0]
        deadline = time.perf_counter() + self.linger
        while total < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            if nxt[0] != first[0]:
                # different op: run it in its own group next round
                self._q.put(nxt)
                break
            items.append(nxt)
            total += nxt[1].shape[0]
        return items

    def _loop(self):
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                break
            items = self._drain(item)
            op = items[0][0]
            batch = np.concatenate([arr for _, arr, _ in items])
            n = batch.shape[0]
            padded = batch
            if n < self.max_batch:
                pad = np.zeros((self.max_batch - n, *batch.shape[1:]), batch.dtype)
                padded = np.concatenate([batch, pad])
            elif n > self.max_batch:
                # split oversize groups
                out_parts = []
                for start in range(0, n, self.max_batch):
                    chunk = batch[start : start + self.max_batch]
                    c = chunk
                    if chunk.shape[0] < self.max_batch:
                        pad = np.zeros(
                            (self.max_batch - chunk.shape[0], *batch.shape[1:]), batch.dtype
                        )
                        c = np.concatenate([chunk, pad])
                    out_parts.append(
                        np.asarray(self._kernels[op](self.variables, jnp.asarray(c)))[
                            : chunk.shape[0]
                        ]
                    )
                result = np.concatenate(out_parts)
                self._resolve(items, result)
                continue
            out = np.asarray(self._kernels[op](self.variables, jnp.asarray(padded)))[:n]
            self._resolve(items, out)

    @staticmethod
    def _resolve(items, result):
        off = 0
        for _, arr, fut in items:
            k = arr.shape[0]
            fut.set_result(result[off : off + k])
            off += k
