"""Batched inference serving.

The reference has no serving story (a single-process Tk app). For production
deployment the unit of efficiency on TPU is the *batch*: this module
provides a thread-safe micro-batching server that aggregates concurrent
encode/decode requests into fixed-shape batches (one compiled program per
op), pads the tail, and fans results back out to callers.

Design: requests enqueue (op, array, Future, deadline); a dispatcher thread
drains the queue, groups by op, pads to `max_batch`, runs the jitted kernel,
and resolves futures. Fixed batch shape = zero recompiles; padding waste is
bounded by max_batch and the configurable linger window.

Robustness:
  * strict FIFO across ops -- a request of a different op parks in an
    internal pending deque and runs in the NEXT group, never behind newer
    arrivals;
  * per-request timeouts (deadline checked at dispatch; expired requests
    fail with TimeoutError instead of occupying batch slots) and
    concurrent.futures cancellation;
  * kernel errors propagate to the affected requests' futures, the
    dispatcher survives;
  * a transport: `serve_http` / `python -m npe_tpu.serving` expose
    /encode /decode /healthz /stats over JSON HTTP (stdlib ThreadingHTTPServer,
    one in-process server shared by all connections so cross-request
    batching still applies).
"""

import queue
import threading
from collections import deque
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
        self._pending = deque()  # parked items, strictly older than the queue
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "batched_items": 0, "timeouts": 0, "errors": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # --- public API ----------------------------------------------------------

    def encode(self, images_nhwc, timeout=None):
        """(n, 64, 64, 3) [-1,1] -> Future of (n, zdim). `timeout` (seconds)
        bounds QUEUE time: a request not dispatched by then fails with
        TimeoutError rather than occupying batch slots."""
        return self._submit("encode", np.asarray(images_nhwc, np.float32), timeout)

    def decode(self, z, timeout=None):
        """(n, zdim) -> Future of (n, 64, 64, 3)."""
        return self._submit("decode", np.asarray(z, np.float32), timeout)

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # --- internals -----------------------------------------------------------

    def _submit(self, op, arr, timeout=None):
        import time

        fut = Future()
        deadline = time.perf_counter() + timeout if timeout is not None else None
        self.stats["requests"] += 1
        self._q.put((op, arr, fut, deadline))
        return fut

    @staticmethod
    def _fail(fut, exc):
        try:
            fut.set_exception(exc)
        except Exception:
            pass  # lost a race with caller-side cancel; nothing to deliver

    def _next_item(self, timeout=None):
        """Oldest live item: parked requests first, then the queue. Expired
        or cancelled requests are consumed (failing their futures) so they
        never take batch slots. Returns None on stop/timeout."""
        import time

        while True:
            if self._pending:
                item = self._pending.popleft()
            else:
                try:
                    item = self._q.get(timeout=timeout) if timeout is not None else self._q.get()
                except queue.Empty:
                    return None
            if item is None:
                self._q.put(None)
                return None
            op, arr, fut, deadline = item
            if fut.cancelled():
                continue
            if deadline is not None and time.perf_counter() > deadline:
                self.stats["timeouts"] += 1
                self._fail(fut, TimeoutError(f"{op} request expired before dispatch"))
                continue
            return item

    def _drain(self, first):
        """Collect same-op requests up to max_batch within the linger window.
        A different-op arrival parks at the FRONT of the pending deque, so it
        leads the next group -- FIFO is preserved across ops."""
        import time

        items = [first]
        total = first[1].shape[0]
        deadline = time.perf_counter() + self.linger
        while total < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            nxt = self._next_item(timeout=timeout)
            if nxt is None:
                break
            if nxt[0] != first[0]:
                self._pending.appendleft(nxt)
                break
            items.append(nxt)
            total += nxt[1].shape[0]
        return items

    def _run(self, op, batch):
        """One fixed-shape kernel invocation (pad tail to max_batch)."""
        n = batch.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n, *batch.shape[1:]), batch.dtype)
            batch = np.concatenate([batch, pad])
        return np.asarray(self._kernels[op](self.variables, jnp.asarray(batch)))[:n]

    def _loop(self):
        while not self._stop.is_set():
            item = self._next_item()
            if item is None:
                break
            items = self._drain(item)
            # the single running-state transition: last cancellation point
            items = [it for it in items if it[2].set_running_or_notify_cancel()]
            if not items:
                continue
            op = items[0][0]
            batch = np.concatenate([arr for _, arr, _, _ in items])
            self.stats["batches"] += 1
            self.stats["batched_items"] += len(items)
            try:
                parts = [
                    self._run(op, batch[s : s + self.max_batch])
                    for s in range(0, batch.shape[0], self.max_batch)
                ]
                result = np.concatenate(parts)
            except Exception as e:  # compile/runtime failure: fail the group
                self.stats["errors"] += len(items)
                for _, _, fut, _ in items:
                    self._fail(fut, e)
                continue
            off = 0
            for _, arr, fut, _ in items:
                k = arr.shape[0]
                fut.set_result(result[off : off + k])
                off += k
        # shutdown: fail anything still queued rather than hanging callers
        while True:
            if self._pending:
                leftover = self._pending.popleft()
            else:
                try:
                    leftover = self._q.get_nowait()
                except queue.Empty:
                    break
            if leftover is not None:
                self._fail(leftover[2], RuntimeError("server closed"))


# --- HTTP transport ----------------------------------------------------------


def serve_http(server, port=8900, host="127.0.0.1"):
    """JSON-over-HTTP transport for an InferenceServer. POST /encode and
    /decode take {"data": <nested list>, "timeout": <sec, optional>} and
    return {"result": <nested list>}; GET /healthz -> {"ok": true},
    GET /stats -> the counters. All connections share ONE InferenceServer,
    so concurrent HTTP requests micro-batch together. Returns the
    ThreadingHTTPServer (serve_forever on the caller's schedule)."""
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, {"ok": True})
            if self.path == "/stats":
                return self._reply(200, dict(server.stats))
            return self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            op = self.path.strip("/")
            if op not in ("encode", "decode"):
                return self._reply(404, {"error": "unknown op"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                arr = np.asarray(req["data"], np.float32)
                fut = getattr(server, op)(arr, timeout=req.get("timeout"))
                # block this connection thread; batching happens server-side
                result = fut.result(timeout=req.get("timeout", 600))
                return self._reply(200, {"result": result.tolist()})
            except TimeoutError as e:
                return self._reply(504, {"error": str(e) or "timeout"})
            except Exception as e:
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd


def main():
    import argparse

    p = argparse.ArgumentParser(description="npe_tpu micro-batching inference server")
    p.add_argument("--config", default="IAN_simple")
    p.add_argument("--weights", default=None)
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--linger-ms", type=float, default=2.0)
    p.add_argument("--bf16", action="store_true")
    a = p.parse_args()
    server = InferenceServer(
        config=a.config,
        weights_path=a.weights,
        max_batch=a.max_batch,
        linger_ms=a.linger_ms,
        dtype=jnp.bfloat16 if a.bf16 else None,
    )
    httpd = serve_http(server, port=a.port)
    print(f"serving {a.config} on http://127.0.0.1:{a.port} (encode/decode/healthz/stats)")
    try:
        httpd.serve_forever()
    finally:
        server.close()


if __name__ == "__main__":
    main()
