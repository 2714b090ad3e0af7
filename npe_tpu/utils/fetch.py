"""Packed device->host fetch.

`jax.device_get` on a ~300-leaf train state issues one transfer per leaf;
over a high-latency link (axon tunnel: ~0.4 s per RPC) that turns a
~900 MB checkpoint fetch into minutes of round-trips. `packed_device_get`
concatenates all leaves of each dtype into ONE 1-D device array inside a
jitted program and fetches those few big buffers instead, then reassembles
the pytree on host. The packing program is compiled once per tree signature
(shapes are static across a training run).

The reference never fetched weights mid-run (Theano shared variables live
on-GPU, host copies only at `GANcheckpoints.save_weights` time,
`train_IAN.py:567-571`); this is the TPU-native equivalent of making that
host copy cheap.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack(leaves):
    return jnp.concatenate([jnp.ravel(x) for x in leaves])


def packed_device_get(tree):
    """Like jax.device_get, but with one device->host transfer per distinct
    leaf dtype instead of one per leaf. Returns a pytree of numpy arrays."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = {}
    for i, a in enumerate(leaves):
        dt = jnp.asarray(a).dtype
        groups.setdefault(str(dt), (dt, []))[1].append(i)

    out = [None] * len(leaves)
    for _, (dt, idxs) in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        buf = np.asarray(_pack([jnp.asarray(leaves[i]) for i in idxs]))
        off = 0
        for i in idxs:
            a = leaves[i]
            n = int(np.prod(np.shape(a), dtype=np.int64))
            out[i] = buf[off : off + n].reshape(np.shape(a))
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
