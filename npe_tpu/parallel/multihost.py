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
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_devices))
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
    state, m1 = gen_step(state, xg, zg, jax.random.PRNGKey(seed + 3), 2e-4)
    state, m2 = discrim_step(state, xg, zg, jax.random.PRNGKey(seed + 4), 2e-4)
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
    a = p.parse_args()
    mesh = init_multihost(a.coordinator, a.num_processes, a.process_id, a.local_devices)
    metrics = demo_step(mesh, batch_size=a.batch_size)
    if jax.process_index() == 0:
        print("MULTIHOST_METRICS " + json.dumps(metrics), flush=True)
    # Align all processes before teardown: on a loaded host the slower
    # process can otherwise miss the coordination-service shutdown barrier
    # (DEADLINE_EXCEEDED) after the faster one exits.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("npe_tpu.multihost.done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
