#!/usr/bin/env python
"""A/B: fused Pallas MDBLOCK kernel vs the per-op XLA formulation, at the
full-IAN decoder geometries, sweeping the kernel's images-per-grid-step."""

import time

import jax
import jax.numpy as jnp

from npe_tpu.models import common
from npe_tpu.models.common import LRELU, VarBuilder
from npe_tpu.ops.pallas.mdcl_kernels import mdblock_fused, stack_mdcl_taps, tap_offsets


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


def main(batch=128):
    scales = [0, 2, 3]
    dt = jnp.bfloat16
    for c, hw in [(256, 16), (128, 32)]:
        vb = VarBuilder(jax.random.PRNGKey(0))
        vb.mdcl("blk", c, c, scales)
        vb.mdcl("blk2", c, c, scales)
        for i in range(3):
            vb.bn(f"blkbnorm{i}", c)
        v = {k: a.astype(dt) if a.dtype == jnp.float32 else a for k, a in vb.v.items()}
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, hw, hw, c), dt) * 0.3

        sec = time_fn(lambda x: common.mdblock(v, None, "blk", x, scales, LRELU, False), x)
        print(f"C={c} @{hw} xla(auto-gate)   {sec * 1e3:7.3f} ms/batch", flush=True)

        saved = common.MDBLOCK_FUSED
        common.MDBLOCK_FUSED = "off"
        sec = time_fn(lambda x: common.mdblock(v, None, "blk", x, scales, LRELU, False), x)
        common.MDBLOCK_FUSED = saved
        print(f"C={c} @{hw} xla(branch)      {sec * 1e3:7.3f} ms/batch", flush=True)

        def affine(name):
            s = (v[f"{name}.gamma"] * v[f"{name}.inv_std"]).astype(jnp.float32)
            return s, v[f"{name}.beta"].astype(jnp.float32) - v[f"{name}.mean"].astype(jnp.float32) * s

        def taps(sfx):
            co = {s: v[f"blk{sfx}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
            return stack_mdcl_taps(v[f"blk{sfx}W"], v[f"blk{sfx}_coeff_base"], co, scales)

        aff = affine("blkbnorm0") + affine("blkbnorm1") + affine("blkbnorm2")
        t1, t2 = taps(""), taps("2")
        offs = tap_offsets(scales)
        for nb in (4, 8, 16):
            sec = time_fn(lambda x: mdblock_fused(x, t1, t2, aff, offs, nb, False), x)
            print(f"C={c} @{hw} pallas nb={nb:<3d}    {sec * 1e3:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
