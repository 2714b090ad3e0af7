#!/usr/bin/env python
"""Edit-propagation step latency benchmark (BASELINE.md target: <10 ms p50).

One edit step = patch-RGB gradient -> latent update -> full decode ->
Gaussian-mask composite (the reference's per-mouse-event work,
`NPE.py:192-235`). Measured on-device by scanning N chained steps inside one
jitted program (per-step time = total / N), which is the honest on-chip
number -- host-tunnel RPC latency is reported separately.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 10.0


def run(iters=100, warmup=2, model="IAN_simple"):
    from npe_tpu.api import patch_mask
    from npe_tpu.models import get_config
    from npe_tpu.ops.pallas.editor_kernels import blur_matrix, edit_tail_reference

    module = get_config(model)
    v = module.init(jax.random.PRNGKey(0))
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from npe_tpu.ops.pallas.editor_kernels import edit_tail as tail_fused

    bm = blur_matrix(64, 0.7)

    def decode_hwc(z):
        return module.decode(v, z[None])[0]

    def rgb_loss(z, c1, r1, c2, r2, rgb):
        xh = decode_hwc(z)
        m = patch_mask(64, 64, c1, r1, c2, r2, xh.dtype)
        return jnp.sum(((rgb - xh) ** 2) * m[:, :, None]) / (jnp.sum(m) * 3)

    recon = jnp.zeros((64, 64, 3))
    error = jnp.zeros((64, 64, 3))
    rgb = jnp.ones((64, 64, 3))

    def one_step(z, box):
        c1, r1, c2, r2 = box
        g = jax.grad(rgb_loss)(z, c1, r1, c2, r2, rgb)
        z2 = z - 0.05 * g * (1.0 + (c2 - c1))
        xh = decode_hwc(z2)
        if on_tpu:
            im = tail_fused(xh, recon, error)
        else:
            im = edit_tail_reference(xh, recon, error, bm)
        return z2, im

    step = jax.jit(one_step)

    # Chain dispatches through z (data dependency) so blocking on the last
    # result forces every step; the brush box is a runtime arg so all steps
    # share ONE compiled program (one ~5-10 min axon compile, then ~2 ms/step).
    rng = np.random.RandomState(1)
    boxes = [
        (int(a), int(b), int(a) + 12, int(b) + 12) for a, b in rng.randint(0, 48, (iters, 2))
    ]
    z = jnp.zeros(module.cfg["num_latents"])
    for _ in range(max(warmup, 1)):
        z2, im = step(z, boxes[0])
        im.block_until_ready()

    rounds = []
    for r in range(5):
        zr = z
        t0 = time.perf_counter()
        for box in boxes:
            zr, im = step(zr, box)
        im.block_until_ready()
        rounds.append((time.perf_counter() - t0) / iters * 1000.0)
    ms = float(np.median(rounds))  # p50 over rounds
    return {
        "metric": "edit_propagation_step_latency"
        + ("" if model == "IAN_simple" else f"_{model.lower()}"),
        "value": round(ms, 3),
        "unit": "ms/step (on-device)",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }


def main(iters=100, warmup=2, model="IAN_simple"):
    print(json.dumps(run(iters=iters, warmup=warmup, model=model)))


if __name__ == "__main__":
    import sys

    main(model=sys.argv[1] if len(sys.argv) > 1 else "IAN_simple")
