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

BASELINE_MS = 10.0


def main(iters=100, warmup=2):
    from npe_tpu.api import patch_mask
    from npe_tpu.models import get_config
    from npe_tpu.ops.pallas.editor_kernels import blur_matrix, edit_tail_reference

    module = get_config("IAN_simple")
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

    @jax.jit
    def chained(z, boxes):
        def body(z, box):
            z2, im = one_step(z, box)
            return z2, jnp.mean(im)

        z_final, ims = jax.lax.scan(body, z, boxes)
        return z_final, jnp.sum(ims)

    # Vary the brush box per step (runtime args, same compiled program).
    k = jax.random.PRNGKey(1)
    starts = jax.random.randint(k, (iters, 2), 0, 48)
    boxes = jnp.stack(
        [starts[:, 0], starts[:, 1], starts[:, 0] + 12, starts[:, 1] + 12], axis=1
    )
    z = jnp.zeros(module.cfg["num_latents"])
    for _ in range(warmup):
        zf, s = chained(z, boxes)
        float(s)
    t0 = time.perf_counter()
    zf, s = chained(z, boxes)
    float(s)
    dt = time.perf_counter() - t0
    ms = dt / iters * 1000.0
    print(
        json.dumps(
            {
                "metric": "edit_propagation_step_latency",
                "value": round(ms, 3),
                "unit": "ms/step (on-device)",
                "vs_baseline": round(BASELINE_MS / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
