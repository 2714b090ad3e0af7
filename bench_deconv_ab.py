#!/usr/bin/env python
"""A/B microbench for the stride-2 5x5 deconv implementations on the model
stage geometries: "split" (4 parity-phase convs + interleave), "block" (one
conv with the phase kernels zero-padded to a shared 3x3 footprint, 4*Cout
channels, depth_to_space), "lhs" (one lhs-dilated conv). The measured table
drives the "auto" rule in npe_tpu/ops/conv.py (DEFAULT_DECONV_MODE).

Chained-scan timing (axon requires a data dependency through iterations).
"""

import time

import jax
import jax.numpy as jnp

from npe_tpu.ops.conv import deconv2d, deconv2d_phased

STAGES = [
    (1024, 512, 4),  # IAN_simple dec_conv1
    (512, 512, 4),  # IAN dec_conv1
    (512, 256, 8),  # dec_conv2
    (256, 128, 16),  # dec_conv3
    (128, 128, 32),  # IAN dec_conv4
    (128, 3, 32),  # IAN_simple dec_out
]


def time_fn(fn, w, x, iters=50, rounds=5):
    @jax.jit
    def chained(w, x):
        def body(carry, _):
            out = fn(w, carry)
            carry = carry * (1.0 + 0.0 * jnp.mean(out).astype(carry.dtype))
            return carry, ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    for _ in range(2):
        float(chained(w, x))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(chained(w, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / iters


def main(batch=128):
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    for cin, cout, h in STAGES:
        x = jax.random.normal(key, (batch, h, h, cin), dt) * 0.1
        w = jax.random.normal(key, (5, 5, cin, cout), dt) * 0.05
        for mode in ("split", "block", "lhs"):
            if mode == "lhs":
                fn = lambda w, x: deconv2d(x, w)
            else:
                fn = lambda w, x, m=mode: deconv2d_phased(x, w, mode=m)
            sec = time_fn(fn, w, x)
            print(f"deconv {cin}->{cout} @{2 * h} {mode:6s} {sec * 1e3:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
