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

    _emit({**primary, "extra": extra})


if __name__ == "__main__":
    main()
