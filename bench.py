#!/usr/bin/env python
"""Headline benchmark suite. Emits ONE JSON line per headline metric
(BASELINE.md target table), ending with a summary line that repeats the
primary metric (IAN_simple encode+decode throughput, target >= 5,000
imgs/sec/chip on TPU v5e) plus an `extra` map of every other metric -- the
driver parses the LAST line, so the full table rides in one artifact.

Metrics:
  ian_simple_encode_decode_throughput   (primary; bf16 inference path)
  ian_encode_decode_throughput          (full IAN: MDBLOCKs, IAF, RGB-Beta)
  ianv1_encode_decode_throughput
  edit_propagation_step_latency         (bench_edit; target < 10 ms p50)
  ian_simple_train_step_throughput      (bench_train; G+D alternation)

Usage: python bench.py [--only primary|ian|ianv1|edit|train] [--fast]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 5000.0

# Analytic FLOPs per image (XLA cost analysis of the exact jitted programs,
# CPU lowering; deterministic -- see BENCHMARKS.md "MFU accounting" for the
# derivation command) and the v5e MXU peak they are measured against.
# bf16 peak 197 TFLOP/s; f32-DEFAULT matmuls/convs on TPU run as bf16 with
# f32 accumulation, so the same peak applies to the f32 train step.
V5E_PEAK_FLOPS = 197e12
FLOPS_PER_IMG = {
    "IAN_simple": 2.185e9,
    "IAN": 8.071e9,
    "IANv1": 2.993e9,
    "IAN_simple_train": 13.02e9,  # mean of gen (11.98) / discrim (14.06) steps, b128
    "IAN_train": 39.62e9,  # mean of gen (47.45) / discrim (31.82); ~batch-independent (b16 vs b64 within 0.4%)
}


def mfu(imgs_per_sec, flops_per_img):
    return round(imgs_per_sec * flops_per_img / V5E_PEAK_FLOPS, 4)


def chip_idle_probe(max_tries=4, settle_s=30.0, threshold_s=2.0):
    """Guard against benching a contended chip (BENCH_r03's 145x train-bench
    spread was chip contention from leftover training runs): time a tiny
    chained program; if the round trip is way past the idle-tunnel norm
    (~0.4-0.6 s RPC + microseconds of compute), wait and retry. Returns the
    probe seconds actually observed (reported in the output for forensics)."""
    if jax.default_backend() != "tpu":
        return None

    @jax.jit
    def tiny(x):
        def body(y, _):
            return y @ y, ()

        y, _ = jax.lax.scan(body, x, None, length=8)
        return jnp.sum(y)

    x = jnp.eye(128, dtype=jnp.bfloat16)
    float(tiny(x))  # compile
    for attempt in range(max_tries):
        t0 = time.perf_counter()
        float(tiny(x))
        dt = time.perf_counter() - t0
        if dt < threshold_s:
            return round(dt, 3)
        print(
            json.dumps({"chip_probe_slow_s": round(dt, 3), "attempt": attempt}),
            file=sys.stderr,
            flush=True,
        )
        time.sleep(settle_s)
    return round(dt, 3)


def run_throughput(model="IAN_simple", batch=256, iters=50, warmup=3, rounds=5, dtype=jnp.bfloat16):
    from npe_tpu.models import get_config
    from npe_tpu.utils.cast import cast_floating

    module = get_config(model)
    variables = module.init(jax.random.PRNGKey(0))
    v16 = cast_floating(variables, dtype)

    def encode_decode(v, x):
        z = module.encode(v, x)
        return module.decode(v, z)

    @jax.jit
    def chained(v, x):
        # One program runs `iters` dependent encode+decode rounds on-device:
        # no per-iteration host round-trips, no async-dispatch mirages.
        def body(y, _):
            return encode_decode(v, 0.9 * y + 0.1 * x), ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 3), dtype) * 0.5
    for _ in range(warmup):
        checksum = float(chained(v16, x))

    # Median over several timed rounds (each round is `iters` chained
    # on-device passes; the float() fetch is the host sync point).
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        checksum = float(chained(v16, x))
        times.append(time.perf_counter() - t0)
    assert jnp.isfinite(checksum)
    times.sort()
    dt = times[len(times) // 2]
    spread = (times[-1] - times[0]) / dt

    imgs_per_sec = batch * iters / dt
    return {
        "metric": f"{model.lower()}_encode_decode_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "p50_round_ms": round(dt * 1000, 2),
        "spread_frac": round(spread, 3),
        "rounds": rounds,
        "mfu": mfu(imgs_per_sec, FLOPS_PER_IMG[model]),
    }


def _emit(d):
    print(json.dumps(d), flush=True)
    return d


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None, choices=["primary", "ian", "ianv1", "edit", "train"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--fast", action="store_true", help="fewer rounds for the secondary metrics")
    a = p.parse_args()

    if a.only:
        if a.only == "primary":
            _emit(run_throughput("IAN_simple", batch=a.batch))
        elif a.only == "ian":
            _emit(run_throughput("IAN", batch=a.batch))
        elif a.only == "ianv1":
            _emit(run_throughput("IANv1", batch=a.batch))
        elif a.only == "edit":
            import bench_edit

            _emit(bench_edit.run())
        else:
            import bench_train

            _emit(bench_train.run(model="IAN_simple", batch=128))
        return

    probe_s = chip_idle_probe()
    primary = _emit(run_throughput("IAN_simple", batch=a.batch))
    extra = {}
    rounds = 3 if a.fast else 5

    def grab(fn, *args, **kw):
        # One failing secondary metric must not sink the suite.
        try:
            d = _emit(fn(*args, **kw))
            extra[d["metric"]] = d["value"]
        except Exception as e:  # pragma: no cover - defensive
            print(json.dumps({"metric_error": f"{fn.__name__}: {e}"}), file=sys.stderr, flush=True)

    grab(run_throughput, "IAN", batch=a.batch, rounds=rounds)
    grab(run_throughput, "IANv1", batch=a.batch, rounds=rounds)
    import bench_edit
    import bench_train

    grab(bench_edit.run)
    grab(bench_train.run, model="IAN_simple", batch=128, pairs=10, rounds=rounds)
    grab(
        bench_train.run,
        model="IAN_simple",
        batch=128,
        pairs=10,
        rounds=3,
        compute_dtype="bfloat16",
    )
    # bf16 Adam moments (cfg['moments_dtype'], versioned-ABI knob): the
    # measured step delta vs the f32-moments row above.
    grab(
        bench_train.run,
        model="IAN_simple",
        batch=128,
        pairs=10,
        rounds=3,
        moments_dtype="bfloat16",
    )
    # Full-width IAN at its faithful batch (`IAN.py:40`). lr=0 pins params at
    # init: per-step compute/memory is lr-independent (Adam's full update
    # still runs), and any lr>0 walks this bench's noise inputs into the
    # randomized-IAF exp overflow within a few hundred pairs -- mechanism
    # pinned in docs/NUMERICS.md; the real 80-epoch recipe trains fine.
    grab(bench_train.run, model="IAN", batch=16, pairs=25, rounds=3, lr=0.0)

    _emit({**primary, "chip_probe_s": probe_s, "extra": extra})


if __name__ == "__main__":
    main()
