#!/usr/bin/env python
"""Headline benchmark: 64x64 encode+decode throughput (imgs/sec/chip) on the
flagship IAN_simple model -- the BASELINE.md target is >= 5,000 imgs/sec/chip
on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The hot path runs in bfloat16 (MXU-native) with float32 still used by the
parity/test paths; one jitted program does encode+decode for the whole batch.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 5000.0


def main(batch=256, iters=50, warmup=3, rounds=5, dtype=jnp.bfloat16, model="IAN_simple"):
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
    print(
        json.dumps(
            {
                "metric": f"{model.lower()}_encode_decode_throughput",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
                "p50_round_ms": round(dt * 1000, 2),
                "spread_frac": round(spread, 3),
                "rounds": rounds,
            }
        )
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IAN_simple")
    p.add_argument("--batch", type=int, default=256)
    a = p.parse_args()
    main(batch=a.batch, model=a.model)
