#!/usr/bin/env python
"""A/B: RGB-Beta head implementations at b128 -- XLA packed (space-to-depth
form) vs the fused Pallas kernel at several images-per-grid-step. Drives the
HEAD_MODE "auto" choice in models/common.py."""

import time

import jax
import jax.numpy as jnp

from npe_tpu.models import get_config
from npe_tpu.models.common import _composed_mdcl_kernel
from npe_tpu.ops.pallas.mdcl_kernels import rgb_beta_head_pallas
from npe_tpu.utils.cast import cast_floating


def time_fn(fn, x, iters=50, rounds=5):
    @jax.jit
    def chained(x):
        def body(carry, _):
            out = fn(carry)
            carry = carry * (1.0 + 0.0 * jnp.mean(out).astype(carry.dtype))
            return carry, ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    for _ in range(2):
        float(chained(x))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / iters


def main():
    m = get_config("IAN")
    v = cast_floating(m.init(jax.random.PRNGKey(0)), jnp.bfloat16)
    h = jax.random.normal(jax.random.PRNGKey(1), (128, 64, 64, 128), jnp.bfloat16) * 0.3
    sec = time_fn(lambda h: m.rgb_beta_head(v, h, mode="packed"), h)
    print(f"xla packed      {sec * 1e3:7.3f} ms/batch", flush=True)
    scales = [2, 3, 4]
    kt = jnp.concatenate([_composed_mdcl_kernel(v, n, scales) for n in ("R", "G_a", "B_a")], -1)
    kg = _composed_mdcl_kernel(v, "G_b", scales)
    kb = _composed_mdcl_kernel(v, "B_b", scales)
    sec = time_fn(lambda h: m.rgb_beta_head(v, h, mode="hybrid"), h)
    print(f"hybrid          {sec * 1e3:7.3f} ms/batch", flush=True)
    for nb in (1, 2):
        sec = time_fn(lambda h: rgb_beta_head_pallas(h, kt, kg, kb, 4, nb, False), h)
        print(f"pallas nb={nb:<3d}   {sec * 1e3:7.3f} ms/batch", flush=True)
    print(f"noop            {time_fn(lambda h: h * 1.0001, h) * 1e3:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
