"""Multi-host (multi-process) data parallelism.

The reference is strictly single-process (SURVEY.md section 2.10). Here the
single-process mesh story (mesh.py) extends across hosts the TPU-native way:
`jax.distributed.initialize` + one global ('data','model') Mesh over ALL
processes' devices; each host feeds only its own shard of the batch and XLA
GSPMD inserts the cross-host gradient all-reduce (ICI within a slice, DCN
across slices -- gloo when testing on CPU processes).

Entry points:
  init_multihost(coordinator, num_processes, process_id, local_devices)
      -- process setup; returns the global mesh. CPU-safe (tests run 2
         processes x 4 virtual devices on one box).
  put_replicated(value, mesh) / put_batch(global_batch, mesh)
      -- build global arrays in multi-controller mode (every process holds
         the same global value; each contributes its addressable shards).
  shard_train_state_multihost(state, mesh)
      -- mesh.py's sharding rules, built via the multi-controller path.

Demo (one faithful IAN_simple G+D step, identical numerics to
single-process -- asserted by tests/test_multihost.py):
  python -m npe_tpu.parallel.multihost --coordinator 127.0.0.1:29500 \
      --num-processes 2 --process-id $i --local-devices 4
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from npe_tpu.parallel.mesh import make_mesh, param_spec


def init_multihost(coordinator, num_processes, process_id, local_devices=None, mesh_shape=None):
    """Initialize the distributed runtime and return the global mesh.

    On CPU (no TPU visible) this self-provisions `local_devices` virtual
    devices per process and uses gloo collectives -- the exact config the
    tests use; on real multi-host TPU pods the same call runs over ICI/DCN.
    """
    if local_devices:
        # CPU-process mode. These must land before the first backend touch
        # (do NOT query jax.devices()/default_backend() first).
        import os

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_devices))
        # Raise the collective-rendezvous watchdog (default 20 s/40 s SIGABRT):
        # on few-core hosts a long sharded program legitimately skews device-
        # thread arrival far past it.
        flags = os.environ.get("XLA_FLAGS", "")
        if "collective_call_terminate_timeout" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            ).strip()
        # XLA:CPU's collective rendezvous aborts (SIGABRT) if all local
        # participants don't arrive within a hard 40 s watchdog; with async
        # dispatch two sharded programs can be in flight and starve each
        # other's rendezvous on few-core hosts. One program at a time.
        jax.config.update("jax_cpu_enable_async_dispatch", False)
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: env JAX_CPU_COLLECTIVES_IMPLEMENTATION
    jax.distributed.initialize(coordinator, num_processes=num_processes, process_id=process_id)
    n = len(jax.devices())
    return make_mesh(shape=mesh_shape or (n, 1))


def _make_global(value, mesh, spec):
    """Build a global array from a host value every process holds in full."""
    value = np.asarray(value)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])


def put_replicated(value, mesh):
    return _make_global(value, mesh, P())


def put_batch(global_batch, mesh):
    """Shard the leading axis of a globally-known batch over 'data'. Each
    process materializes only its addressable rows."""
    nd = np.ndim(global_batch)
    return _make_global(global_batch, mesh, P("data", *([None] * (nd - 1))))


def shard_train_state_multihost(state, mesh):
    """mesh.py's param_spec rules, via the multi-controller constructor.

    Unlike single-process sharding, EVERY leaf must become a global
    jax.Array here (multi-controller jit cannot auto-promote host arrays),
    so non-dict optimizer leaves (the Adam step counts) are replicated
    explicitly."""

    def shard_dict(d):
        return {k: _make_global(v, mesh, param_spec(k, v)) for k, v in d.items()}

    parts = {p: shard_dict(vs) for p, vs in state["parts"].items()}

    def shard_opt(opt_state):
        # scale_by_adam state: (ScaleByAdamState(count, mu, nu),); mu/nu are
        # param-name dicts sharded like their parameters, count replicated.
        return jax.tree_util.tree_map(
            lambda t: shard_dict(t) if isinstance(t, dict) else put_replicated(t, mesh),
            opt_state,
            is_leaf=lambda t: isinstance(t, dict),
        )

    opt = {k: shard_opt(v) for k, v in state["opt"].items()}
    step = put_replicated(state["step"], mesh)
    return {"parts": parts, "opt": opt, "step": step}


def demo_step(mesh, batch_size=16, config="IAN_simple", seed=0):
    """One faithful G step + one D step, data-parallel over the global mesh.
    Returns {metric: float} (identical on every process)."""
    import jax.numpy as jnp

    from npe_tpu.models import get_config
    from npe_tpu.training import train_step as TS

    # Establish the cross-process collective context FIRST with a tiny
    # barrier program: gloo TCP pairs connect while every process is alive
    # and waiting. Without this, the first collective sits inside the big
    # G/D step -- on a loaded host the processes' multi-minute compiles skew
    # and gloo's connect timeout expires before the slow process arrives.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("npe_tpu.multihost.ready")

    module = get_config(config)
    cfg = dict(module.cfg)
    variables = module.init(jax.random.PRNGKey(seed))
    state = TS.init_train_state(module, variables, cfg)
    state = shard_train_state_multihost(state, mesh)
    gen_step, discrim_step = TS.make_train_steps(module, cfg)

    # Deterministic global batch: every host computes it, feeds its shard.
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed + 1), (batch_size, 64, 64, 3)) * 0.5
    )
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 2), (batch_size, cfg["num_latents"])))
    xg = put_batch(x, mesh)
    zg = put_batch(z, mesh)
    k3, k4 = jax.random.PRNGKey(seed + 3), jax.random.PRNGKey(seed + 4)
    # AOT-compile BOTH programs locally (compilation needs no peers), then
    # barrier, then execute in lockstep. Without this, the first process to
    # finish its multi-minute compile reaches the step's first cross-process
    # collective alone and gloo's 30 s key-value GetKeyValue deadline expires
    # before the slower process arrives (observed DEADLINE_EXCEEDED on
    # loaded/slow hosts; compile skew is unbounded, execution skew is not).
    gen_c = gen_step.lower(state, xg, zg, k3, 2e-4).compile()
    discrim_c = discrim_step.lower(state, xg, zg, k4, 2e-4).compile()
    multihost_utils.sync_global_devices("npe_tpu.multihost.compiled")
    state, m1 = gen_c(state, xg, zg, k3, 2e-4)
    jax.block_until_ready(m1)  # never two sharded programs in flight
    state, m2 = discrim_c(state, xg, zg, k4, 2e-4)
    out = {k: float(v) for k, v in m1.items()}
    out.update({k: float(v) for k, v in m2.items()})
    return out


def main():
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="127.0.0.1:29500")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--config", default="IAN_simple", help="model config name or path")
    a = p.parse_args()
    mesh = init_multihost(a.coordinator, a.num_processes, a.process_id, a.local_devices)
    metrics = demo_step(mesh, batch_size=a.batch_size, config=a.config)
    if jax.process_index() == 0:
        print("MULTIHOST_METRICS " + json.dumps(metrics), flush=True)
    # Align all processes once more (proves every process finished the step),
    # then exit WITHOUT the coordinated jax.distributed.shutdown(): its
    # shutdown barrier (300 s deadline) and the gloo teardown behind it
    # intermittently wedge one task on slow single-core hosts AFTER all real
    # work succeeded, turning a green run into a fatal
    # "Shutdown barrier has failed" abort in the peer. The demo's contract is
    # the printed metrics; a hard exit after the final device sync is the
    # robust teardown here (real pod deployments should keep shutdown()).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("npe_tpu.multihost.done")
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(0)


if __name__ == "__main__":
    main()
