"""Device mesh + sharding rules.

The reference is strictly single-process single-GPU (SURVEY.md section 2.10);
its only nod to scale is a TODO comment (`train_IAN_simple.py:25`). Here
parallelism is first-class and TPU-native:

  * a 2-D `jax.sharding.Mesh` with axes ('data', 'model');
  * data parallelism: the batch axis of every step input is sharded over
    'data'; XLA GSPMD inserts the gradient all-reduce (psum) over ICI --
    the single collective this workload needs;
  * tensor parallelism: the channel-heavy weights (the 1024-channel conv
    tower, the 16k-wide decoder FC, the minibatch-discrimination tensor)
    are sharded over 'model' on their output-feature axis; GSPMD inserts
    the boundary collectives.

No NCCL/MPI translation: placement is declared with NamedSharding and the
compiler owns the communication schedule. Multi-host would only add
`jax.distributed.initialize` + per-host data feeding.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, devices=None):
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(
            f"mesh shape {shape} needs {shape[0] * shape[1]} devices but "
            f"{n} are available ({[d.platform for d in devices]}); pass a "
            f"matching shape= or provision more devices (e.g. "
            f"--xla_force_host_platform_device_count)"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


# Parameters worth sharding over the model axis: (name predicate, axis).
def param_spec(name, value):
    """PartitionSpec for a variable, by name/shape. Output-feature axis of
    the big tensors goes to 'model'; everything else is replicated.

    The 4-D rule matches both plain conv/deconv kernels ('enc_conv4.W',
    'dec_conv1.W') and MDCL base filters ('dec_conv2aW', 'RW' -- Lasagne
    names without the dot, reference `layers.py:218`); their per-scale
    coefficient vectors stay replicated, which GSPMD broadcasts into the
    sharded compose elementwise."""
    shape = np.shape(value)
    if name.endswith("W") and len(shape) == 4 and shape[3] >= 512:
        return P(None, None, None, "model")  # conv/deconv/MDCL HWIO out-channels
    if name.endswith(".W") and len(shape) == 2 and shape[1] >= 4096:
        return P(None, "model")  # wide dense (l_dec_fc2, enc_fc1 is 1000-out)
    if name.endswith("minibatch_discrim.theta"):
        return P(None, "model", None)
    return P()


def shard_variables(variables, mesh):
    return {
        k: jax.device_put(v, NamedSharding(mesh, param_spec(k, v)))
        for k, v in variables.items()
    }


def shard_train_state(state, mesh):
    """Shard a train state: partitioned variables by rule, optimizer moments
    like their parameters, scalars replicated."""
    parts = {
        pname: shard_variables(pvars, mesh) for pname, pvars in state["parts"].items()
    }

    def shard_opt(opt_state):
        # scale_by_adam state: (ScaleByAdamState(count, mu, nu),) pytrees with
        # mu/nu dicts matching params -- shard them with the same rule.
        def shard_like(tree):
            if isinstance(tree, dict):
                return {
                    k: jax.device_put(v, NamedSharding(mesh, param_spec(k, v)))
                    for k, v in tree.items()
                }
            return tree

        return jax.tree_util.tree_map(
            shard_like,
            opt_state,
            is_leaf=lambda t: isinstance(t, dict),
        )

    opt = {k: shard_opt(v) for k, v in state["opt"].items()}
    step = jax.device_put(state["step"], NamedSharding(mesh, P()))
    return {"parts": parts, "opt": opt, "step": step}


def shard_batch(x, mesh):
    """Shard the leading (batch) axis over 'data'."""
    ndim = np.ndim(x)
    spec = P("data", *([None] * (ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
