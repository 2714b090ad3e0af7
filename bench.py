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


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def main(batch=256, iters=20, warmup=3, dtype=jnp.bfloat16):
    from npe_tpu.models import get_config

    module = get_config("IAN_simple")
    variables = module.init(jax.random.PRNGKey(0))
    v16 = cast_tree(variables, dtype)

    @jax.jit
    def encode_decode(v, x):
        z = module.encode(v, x)
        return module.decode(v, z)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 3), dtype) * 0.5
    # Warmup / compile; chain iterations through a data dependency so async
    # dispatch (and any experimental-platform laziness) cannot hide work,
    # and fetch the result to host to force completion.
    y = x
    for _ in range(warmup):
        y = encode_decode(v16, 0.9 * y + 0.1 * x)
    float(jnp.sum(y))

    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = encode_decode(v16, 0.9 * y + 0.1 * x)
    checksum = float(jnp.sum(y))
    dt = time.perf_counter() - t0
    assert jnp.isfinite(checksum)

    imgs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "ian_simple_encode_decode_throughput",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
