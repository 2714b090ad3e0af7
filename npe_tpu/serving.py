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

Latency SLOs: a request may carry `slo` seconds (total latency target). The
dispatcher keeps an EMA of per-op kernel time and shortens the linger window
so the OLDEST request's slack is respected: it stops aggregating when
now + est_kernel_time would breach any member's SLO. Tight-SLO requests
dispatch (nearly) immediately at low traffic; relaxed ones batch fully.

Multi-model hosting: `ModelHost` runs several named InferenceServers in one
process (one dispatcher each -- per-model FIFO, shared device). The HTTP
transport routes /<model>/encode|decode, plus default-model /encode|/decode
and GET /models.

Wire format: with `wire="uint8"` image payloads cross the host<->device
link as uint8 (4x fewer bytes than float32) -- encode inputs are quantized
to the [0,255] grid on the host and cast+to_tanh'd on device; decode
outputs are quantized to uint8 ON DEVICE and dequantized on the host, so
the public API still speaks float32 [-1,1]. bench_serving measured the
f32 batch payload as the dominant client-latency term through the remote
tunnel (BENCHMARKS.md round-5 serving section), and uint8 is already the
framework's storage/display format (data staging ships uint8 chunks,
`ops/pallas/staging.py`; the editor quantizes RECON to uint8,
`editor/engine.py`). Lossless for inputs that came from uint8 images;
otherwise adds at most one 1/255-of-range quantization step per direction.
Default stays "float32" (exact).
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
        wire="float32",
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
        if wire not in ("float32", "uint8"):
            raise ValueError(f"wire must be 'float32' or 'uint8', got {wire!r}")
        self.wire = wire
        mod = self.module
        in_dtype = dtype or jnp.float32

        if wire == "uint8":
            from npe_tpu.utils.ranges import from_tanh, to_tanh

            @jax.jit
            def _encode(v, x_u8):
                x = to_tanh(x_u8.astype(jnp.float32))
                return mod.encode(v, x.astype(in_dtype)).astype(jnp.float32)

            @jax.jit
            def _decode(v, z):
                y = mod.decode(v, z.astype(in_dtype)).astype(jnp.float32)
                return jnp.clip(jnp.round(from_tanh(y)), 0.0, 255.0).astype(jnp.uint8)

        else:

            @jax.jit
            def _encode(v, x):
                return mod.encode(v, x.astype(in_dtype)).astype(jnp.float32)

            @jax.jit
            def _decode(v, z):
                return mod.decode(v, z.astype(in_dtype)).astype(jnp.float32)

        self._kernels = {"encode": _encode, "decode": _decode}
        # per-op EMA of kernel wall time; None until the op's program is warm
        # (the first call's compile time must not poison the estimate)
        self._kernel_ema = {"encode": None, "decode": None}
        self._q = queue.Queue()
        self._pending = deque()  # parked items, strictly older than the queue
        self._stop = threading.Event()
        self.stats = {
            "requests": 0,
            "batches": 0,
            "batched_items": 0,
            "timeouts": 0,
            "errors": 0,
            "slo_tightened": 0,
        }
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # --- public API ----------------------------------------------------------

    def encode(self, images_nhwc, timeout=None, slo=None):
        """(n, 64, 64, 3) [-1,1] -> Future of (n, zdim). `timeout` (seconds)
        bounds QUEUE time: a request not dispatched by then fails with
        TimeoutError rather than occupying batch slots. `slo` (seconds) is a
        total-latency target: the batcher stops aggregating early rather than
        linger past it (best effort -- kernel time itself is a floor).

        Under wire='uint8' a uint8 [0,255] array is accepted as-is (zero
        conversion cost); float input is quantized to that grid HERE, on the
        caller's thread, so the dispatcher thread never serializes on it."""
        arr = np.asarray(images_nhwc)
        if self.wire == "uint8":
            if arr.dtype != np.uint8:
                from npe_tpu.utils.ranges import from_tanh

                arr = np.clip(np.round(from_tanh(np.float32(arr))), 0.0, 255.0).astype(np.uint8)
        else:
            arr = np.asarray(arr, np.float32)
        return self._submit("encode", arr, timeout, slo)

    def decode(self, z, timeout=None, slo=None):
        """(n, zdim) -> Future of (n, 64, 64, 3)."""
        return self._submit("decode", np.asarray(z, np.float32), timeout, slo)

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # --- internals -----------------------------------------------------------

    def _submit(self, op, arr, timeout=None, slo=None):
        import time

        fut = Future()
        now = time.perf_counter()
        deadline = now + timeout if timeout is not None else None
        slo_deadline = now + slo if slo is not None else None
        self.stats["requests"] += 1
        self._q.put((op, arr, fut, deadline, slo_deadline))
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
            op, arr, fut, deadline, _slo = item
            if fut.cancelled():
                continue
            if deadline is not None and time.perf_counter() > deadline:
                self.stats["timeouts"] += 1
                self._fail(fut, TimeoutError(f"{op} request expired before dispatch"))
                continue
            return item

    def _slo_cap(self, items):
        """Latest moment aggregation may continue without breaching any
        member's SLO: min(slo_deadline) - estimated kernel time. None when no
        member carries an SLO or the op's kernel is not warm yet (a cold
        first call is compile-bound; no estimate can save its SLO)."""
        slos = [it[4] for it in items if it[4] is not None]
        if not slos:
            return None
        est = self._kernel_ema.get(items[0][0])
        return min(slos) - (est if est is not None else 0.0)

    def _drain(self, first):
        """Collect same-op requests up to max_batch within the linger window,
        shortened to respect the tightest member SLO. A different-op arrival
        parks at the FRONT of the pending deque, so it leads the next group
        -- FIFO is preserved across ops."""
        import time

        items = [first]
        total = first[1].shape[0]
        deadline = time.perf_counter() + self.linger
        tightened = False
        while total < self.max_batch:
            cap = self._slo_cap(items)
            window_end = deadline
            if cap is not None and cap < window_end:
                window_end = cap
                tightened = True
            timeout = window_end - time.perf_counter()
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
        if tightened:
            self.stats["slo_tightened"] += 1
        return items

    def _run(self, op, batch):
        """One fixed-shape kernel invocation (pad tail to max_batch)."""
        n = batch.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n, *batch.shape[1:]), batch.dtype)
            batch = np.concatenate([batch, pad])
        out = np.asarray(self._kernels[op](self.variables, jnp.asarray(batch)))[:n]
        if self.wire == "uint8" and op == "decode":
            from npe_tpu.utils.ranges import to_tanh

            out = to_tanh(np.float32(out))
        return out

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
            batch = np.concatenate([arr for _, arr, _, _, _ in items])
            self.stats["batches"] += 1
            self.stats["batched_items"] += len(items)
            try:
                import time

                t0 = time.perf_counter()
                parts = [
                    self._run(op, batch[s : s + self.max_batch])
                    for s in range(0, batch.shape[0], self.max_batch)
                ]
                result = np.concatenate(parts)
                dt = (time.perf_counter() - t0) / max(1, len(parts))
                ema = self._kernel_ema.get(op)
                if ema is not None:
                    self._kernel_ema[op] = 0.7 * ema + 0.3 * dt
                elif dt <= 1.0:
                    # seed the estimate; a >1 s first sample is compile-bound
                    # (cold jit) and would poison it -- wait for a warm one
                    self._kernel_ema[op] = dt
            except Exception as e:  # compile/runtime failure: fail the group
                self.stats["errors"] += len(items)
                for _, _, fut, _, _ in items:
                    self._fail(fut, e)
                continue
            off = 0
            for _, arr, fut, _, _ in items:
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


# --- multi-model hosting ------------------------------------------------------


class ModelHost:
    """Several named InferenceServers in one process, one device. Each model
    keeps its own dispatcher (per-model FIFO + batching); the jitted kernels
    interleave on the shared accelerator. The first added model is the
    default (unprefixed /encode and /decode routes)."""

    def __init__(self):
        self.servers = {}
        self.default = None

    def add(self, name, server):
        if name in self.servers:
            raise KeyError(f"model {name!r} already hosted")
        self.servers[name] = server
        if self.default is None:
            self.default = name
        return server

    def get(self, name=None):
        key = name or self.default
        if key not in self.servers:
            raise KeyError(f"unknown model {key!r}; have {sorted(self.servers)}")
        return self.servers[key]

    def stats(self):
        return {name: dict(s.stats) for name, s in self.servers.items()}

    def close(self):
        for s in self.servers.values():
            s.close()


# --- HTTP transport ----------------------------------------------------------


def serve_http(server, port=8900, host="127.0.0.1"):
    """JSON-over-HTTP transport for an InferenceServer or a ModelHost.

    POST /encode and /decode (default model) or /<model>/encode|decode take
    {"data": <nested list>, "timeout": <sec>, "slo_ms": <float>} and return
    {"result": <nested list>}; GET /healthz -> {"ok": true}, GET /stats ->
    the counters, GET /models -> hosted model names. All connections share
    the in-process servers, so concurrent HTTP requests micro-batch
    together. Returns the ThreadingHTTPServer (serve_forever on the
    caller's schedule)."""
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    host_obj = server if isinstance(server, ModelHost) else None

    def resolve(model_name):
        if host_obj is not None:
            return host_obj.get(model_name)
        if model_name is not None:
            raise KeyError(f"single-model server has no model {model_name!r}")
        return server

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
                stats = host_obj.stats() if host_obj is not None else dict(server.stats)
                return self._reply(200, stats)
            if self.path == "/models":
                if host_obj is not None:
                    return self._reply(
                        200, {"models": sorted(host_obj.servers), "default": host_obj.default}
                    )
                return self._reply(200, {"models": ["default"], "default": "default"})
            return self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 1:
                model_name, op = None, parts[0]
            elif len(parts) == 2:
                model_name, op = parts
            else:
                return self._reply(404, {"error": "unknown path"})
            if op not in ("encode", "decode"):
                return self._reply(404, {"error": "unknown op"})
            try:
                target = resolve(model_name)
            except KeyError as e:
                return self._reply(404, {"error": str(e)})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                arr = np.asarray(req["data"], np.float32)
                slo = req.get("slo_ms")
                fut = getattr(target, op)(
                    arr,
                    timeout=req.get("timeout"),
                    slo=slo / 1000.0 if slo is not None else None,
                )
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
    p.add_argument(
        "--model",
        action="append",
        default=None,
        metavar="NAME=CONFIG[:WEIGHTS]",
        help="host an additional named model (repeatable); the first --model "
        "becomes the default route. Without --model, --config/--weights "
        "serve a single model.",
    )
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--linger-ms", type=float, default=2.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument(
        "--wire",
        default="float32",
        choices=["float32", "uint8"],
        help="image payload dtype over the host<->device link (uint8 = 4x "
        "fewer bytes; see module docstring)",
    )
    a = p.parse_args()
    dtype = jnp.bfloat16 if a.bf16 else None

    if a.model:
        server = ModelHost()
        for spec in a.model:
            name, _, rest = spec.partition("=")
            if not rest:
                raise SystemExit(f"--model {spec!r}: expected NAME=CONFIG[:WEIGHTS]")
            config, _, weights = rest.partition(":")
            server.add(
                name,
                InferenceServer(
                    config=config,
                    weights_path=weights or None,
                    max_batch=a.max_batch,
                    linger_ms=a.linger_ms,
                    dtype=dtype,
                    wire=a.wire,
                ),
            )
        what = ", ".join(sorted(server.servers))
    else:
        server = InferenceServer(
            config=a.config,
            weights_path=a.weights,
            max_batch=a.max_batch,
            linger_ms=a.linger_ms,
            dtype=dtype,
            wire=a.wire,
        )
        what = a.config
    httpd = serve_http(server, port=a.port)
    print(f"serving {what} on http://127.0.0.1:{a.port} (encode/decode/healthz/stats/models)")
    try:
        httpd.serve_forever()
    finally:
        server.close()


if __name__ == "__main__":
    main()
