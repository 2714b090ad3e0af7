#!/usr/bin/env python
"""Per-stage profile of full-IAN inference (encode + decode), bf16.

Times each pipeline stage as its own chained jitted program (scan keeps a
data dependency through iterations -- required under axon, where
block_until_ready does not await unchained dispatches) and reports
ms/batch, imgs/sec, an analytic MAC count, and achieved TFLOP/s per stage.
Used to target the round-2 fusion work (VERDICT item 5): which stages sit
below the MXU roofline and why.

Usage: python bench_stages.py [--model IAN] [--batch 128] [--mdcl-mode fused|branch]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from npe_tpu.models import get_config
from npe_tpu.utils.cast import cast_floating


def time_stage(fn, v, x, iters=10, rounds=5, warmup=2):
    """Median seconds per single fn(v, x) call, data-chained."""

    @jax.jit
    def chained(v, x):
        def body(carry, _):
            out = fn(v, carry)
            # feed a scalar of the output back into the (shape-preserving)
            # carry so iterations are data-dependent
            carry = carry * (1.0 + 0.0 * jnp.mean(out).astype(carry.dtype))
            return carry, ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    for _ in range(warmup):
        s = float(chained(v, x))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = float(chained(v, x))
        times.append(time.perf_counter() - t0)
    assert jnp.isfinite(s)
    times.sort()
    return times[len(times) // 2] / iters


def conv_macs(spatial, taps, cin, cout):
    return spatial * spatial * taps * cin * cout


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IAN")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mdcl-mode", default=None, choices=[None, "fused", "branch", "auto"])
    a = p.parse_args()

    if a.mdcl_mode:
        from npe_tpu.ops import mdcl as MD

        MD.DEFAULT_MODE = a.mdcl_mode

    module = get_config(a.model)
    dtype = jnp.bfloat16
    v = cast_floating(module.init(jax.random.PRNGKey(0)), dtype)
    b = a.batch
    from npe_tpu.models.common import LRELU, bn, mdblock

    zdim = module.cfg["num_latents"]

    # --- stage definitions: (name, fn, input array, MACs/img or None) -----
    stages = []

    def add(name, fn, x, macs=None):
        stages.append((name, fn, x, macs))

    key = jax.random.PRNGKey(1)
    x_img = jax.random.normal(key, (b, 64, 64, 3), dtype) * 0.5
    add(
        "encode(total)",
        lambda v, x: module.encode(v, x),
        x_img,
        conv_macs(32, 75, 1, 128)  # 5x5x3 -> 128
        + conv_macs(16, 25, 128, 256)
        + conv_macs(8, 25, 256, 512)
        + conv_macs(4, 25, 512, 1024)
        + 16384 * 1000
        + 2 * 1000 * zdim,
    )
    z = jax.random.normal(key, (b, zdim), dtype)
    add("decode(total)", lambda v, x: module.decode(v, x), z, None)

    if a.model == "IAN":
        from npe_tpu.models.ian import rgb_beta_head
        from npe_tpu.ops.conv import deconv2d_phased as dc
        from npe_tpu.ops.linear import dense
        from npe_tpu.models.common import unflatten_nchw

        h4 = jax.random.normal(key, (b, 4, 4, 512), dtype) * 0.1
        h8 = jax.random.normal(key, (b, 8, 8, 512), dtype) * 0.1
        h16 = jax.random.normal(key, (b, 16, 16, 256), dtype) * 0.1
        h32 = jax.random.normal(key, (b, 32, 32, 128), dtype) * 0.1
        h64 = jax.random.normal(key, (b, 64, 64, 128), dtype) * 0.1

        add(
            "fc2+unflatten",
            lambda v, x: unflatten_nchw(LRELU(dense(x, v["l_dec_fc2.W"], v["l_dec_fc2.b"])), 512, 4, 4),
            z,
            zdim * 8192,
        )
        add("deconv1 512->512 @8", lambda v, x: dc(x, v["dec_conv1.W"], b=v["dec_conv1.b"]), h4,
            conv_macs(8, 25, 512, 512) // 4)
        add("mdblock2a @8 512 [0,2]",
            lambda v, x: mdblock(v, None, "dec_conv2a", x, [0, 2], LRELU, False), h8,
            2 * conv_macs(8, 25, 512, 512))
        add("deconv2 512->256 @16", lambda v, x: dc(x, v["dec_conv2.W"], b=v["dec_conv2.b"]), h8,
            conv_macs(16, 25, 512, 256) // 4)
        add("mdblock3a @16 256 [0,2,3]",
            lambda v, x: mdblock(v, None, "dec_conv3a", x, [0, 2, 3], LRELU, False), h16,
            2 * conv_macs(16, 49, 256, 256))
        add("deconv3 256->128 @32", lambda v, x: dc(x, v["dec_conv3.W"], b=v["dec_conv3.b"]), h16,
            conv_macs(32, 25, 256, 128) // 4)
        add("mdblock4a @32 128 [0,2,3]",
            lambda v, x: mdblock(v, None, "dec_conv4a", x, [0, 2, 3], LRELU, False), h32,
            2 * conv_macs(32, 49, 128, 128))
        add("deconv4+bn 128->128 @64",
            lambda v, x: LRELU(bn(v, None, "bnorm_dc4", dc(x, v["dec_conv4.W"]), False)), h32,
            conv_macs(64, 25, 128, 128) // 4)
        add("rgb_beta_head @64", lambda v, x: rgb_beta_head(v, x), h64,
            conv_macs(64, 81, 128, 6) + conv_macs(64, 81, 2, 2) + conv_macs(64, 81, 4, 2))

    print(f"model={a.model} batch={b} dtype=bf16 mdcl_mode={a.mdcl_mode or 'default'}")
    rows = []
    for name, fn, x, macs in stages:
        sec = time_stage(fn, v, x, iters=a.iters)
        ms = sec * 1e3
        imgs = b / sec
        tflops = (2 * macs * b / sec / 1e12) if macs else None
        rows.append({"stage": name, "ms_per_batch": round(ms, 3),
                     "imgs_per_sec": round(imgs),
                     "tflops": round(tflops, 2) if tflops else None})
        print(f"{name:28s} {ms:8.3f} ms/batch  {imgs:10.0f} imgs/s"
              + (f"  {tflops:6.2f} TFLOP/s" if tflops else ""))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
