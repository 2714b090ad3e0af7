"""Profile the IAN_simple training step on the real TPU: compile the
bench_train chained program, trace a few steady-state pairs, print top ops.

Usage (from the repo root, TPU/axon platform):
    python scripts/profile_train_step.py [--pairs 4] [--batch 128]
        [--compute-dtype bfloat16] [--out /tmp/train_prof]
"""

import argparse
import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IAN_simple")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--pairs", type=int, default=4)
    p.add_argument("--compute-dtype", default=None)
    p.add_argument("--out", default="/tmp/train_prof")
    p.add_argument(
        "--dump-hlo",
        action="store_true",
        help="also write the optimized backend HLO text (fusion names in the "
        "xplane trace resolve to fused computations whose instruction metadata "
        "carries the originating Python source lines)",
    )
    a = p.parse_args()

    from npe_tpu.models import get_config
    from npe_tpu.training import train_step as TS

    module = get_config(a.model)
    cfg = dict(module.cfg)
    cfg["batch_size"] = a.batch
    if a.compute_dtype:
        cfg["compute_dtype"] = a.compute_dtype
    variables = module.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(module, variables, cfg)
    gen_step, discrim_step = TS.make_train_steps(module, cfg, donate=False)
    lr = 2e-4

    @functools.partial(jax.jit, donate_argnums=0)
    def chained(state, x, z, key):
        def body(state, i):
            k = jax.random.fold_in(key, i)
            state, _ = gen_step(state, x, z, k, lr)
            state, m = discrim_step(state, x, z, jax.random.fold_in(k, 1), lr)
            return state, m["pixel_loss"]

        state, pl = jax.lax.scan(body, state, jnp.arange(a.pairs))
        return state, jnp.sum(pl)

    # strictly inside (-1, 1) -- full IAN's Beta NLL is non-finite otherwise
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (a.batch, 64, 64, 3), jnp.float32) * 0.5)
    z = jax.random.normal(jax.random.PRNGKey(2), (a.batch, cfg["num_latents"]))

    call = chained
    if a.dump_hlo:
        os.makedirs(a.out, exist_ok=True)
        print("compiling (explicit lower for the HLO dump)...", flush=True)
        call = chained.lower(state, x, z, jax.random.PRNGKey(10)).compile()
        hlo_path = os.path.join(a.out, "optimized.hlo.txt")
        with open(hlo_path, "w") as f:
            f.write(call.as_text())
        print("wrote", hlo_path, flush=True)
    else:
        print("compiling...", flush=True)
    state, s = call(state, x, z, jax.random.PRNGKey(10))
    print("warmup checksum", float(s), flush=True)

    t0 = time.perf_counter()
    jax.profiler.start_trace(a.out)
    state, s = call(state, x, z, jax.random.PRNGKey(11))
    cs = float(s)
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    n_steps = 2 * a.pairs
    print(
        f"traced round: {dt:.3f}s total, {dt/n_steps*1e3:.2f} ms/step "
        f"(incl. trace overhead), checksum {cs}",
        flush=True,
    )
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "trace_top_ops.py"), a.out, "--top", "40"]
    )


if __name__ == "__main__":
    main()
