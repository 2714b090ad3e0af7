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


def run(iters=100, warmup=2, model="IAN_simple", rounds=20, steps_per_round=50):
    from npe_tpu.api import soft_patch_mask
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

    def rgb_loss(z, c1, r1, c2, r2, sigma, rgb):
        xh = decode_hwc(z)
        # Runtime sigma: 0 == the hard box, >0 == the feathered gk brush --
        # both stroke variants share this ONE compiled program (api.py wiring).
        m = soft_patch_mask(64, 64, c1, r1, c2, r2, sigma, xh.dtype)
        return jnp.sum(((rgb - xh) ** 2) * m[:, :, None]) / (jnp.sum(m) * 3)

    recon = jnp.zeros((64, 64, 3))
    error = jnp.zeros((64, 64, 3))
    rgb = jnp.ones((64, 64, 3))

    def one_step(z, box, sigma):
        c1, r1, c2, r2 = box
        g = jax.grad(rgb_loss)(z, c1, r1, c2, r2, sigma, rgb)
        z2 = z - 0.05 * g * (1.0 + (c2 - c1))
        xh = decode_hwc(z2)
        if on_tpu:
            im = tail_fused(xh, recon, error)
        else:
            im = edit_tail_reference(xh, recon, error, bm)
        return z2, im

    step = jax.jit(one_step)

    # Varied stroke sequence (the product's actual contract, per-mouse-event
    # loop `NPE.py:192-235`): brush sizes 4..40 px, positions anywhere,
    # alternating hard box / feathered soft brush. Brush coords and sigma are
    # runtime args so every stroke shares ONE compiled program (one ~5-10 min
    # axon compile, then ~ms steps).
    rng = np.random.RandomState(1)
    n_strokes = rounds * steps_per_round
    sizes = rng.randint(4, 41, n_strokes)
    pos = rng.randint(0, 60, (n_strokes, 2))
    strokes = []
    for i in range(n_strokes):
        a, b = int(pos[i][0]), int(pos[i][1])
        s = int(sizes[i])
        sigma = 0.0 if i % 2 == 0 else float(rng.uniform(0.3, 2.0))
        strokes.append(((a, b, min(a + s, 63), min(b + s, 63)), sigma))

    z = jnp.zeros(module.cfg["num_latents"])
    for _ in range(max(warmup, 1)):
        z2, im = step(z, strokes[0][0], strokes[0][1])
        im.block_until_ready()

    # Each timed round chains `steps_per_round` strokes through z (a data
    # dependency, so the final fetch forces every step -- under axon,
    # block_until_ready alone is not a reliable barrier for earlier
    # unchained dispatches); p50/p95 are over the per-round means.
    round_ms = []
    for r in range(rounds):
        zr = z
        t0 = time.perf_counter()
        for box, sigma in strokes[r * steps_per_round : (r + 1) * steps_per_round]:
            zr, im = step(zr, box, sigma)
        im.block_until_ready()  # im is data-dependent on the whole z chain
        round_ms.append((time.perf_counter() - t0) / steps_per_round * 1000.0)
    round_ms.sort()
    p50 = float(np.percentile(round_ms, 50))
    p95 = float(np.percentile(round_ms, 95))
    return {
        "metric": "edit_propagation_step_latency"
        + ("" if model == "IAN_simple" else f"_{model.lower()}"),
        "value": round(p50, 3),
        "unit": "ms/step (on-device)",
        "vs_baseline": round(BASELINE_MS / p50, 3),
        "p95_ms": round(p95, 3),
        "strokes": n_strokes,
        "mix": "sizes 4-40px, hard box / soft gk sigma 0.3-2.0 alternating",
    }


def main(iters=100, warmup=2, model="IAN_simple"):
    print(json.dumps(run(iters=iters, warmup=warmup, model=model)))


if __name__ == "__main__":
    import sys

    main(model=sys.argv[1] if len(sys.argv) > 1 else "IAN_simple")
