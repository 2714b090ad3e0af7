"""Checkpointing.

`save_weights` / `load_weights` keep the reference's checkpoint ABI
(`GANcheckpoints.py:11-57`): a name-keyed compressed .npz of parameter values
plus a pickled metadata dict, written atomically via tmp-file rename; restore
is name-matched, WARNS AND SKIPS shape mismatches (enabling partial /
architecture-drift loading) and warns on missing params.

`save_train_state` / `load_train_state` go beyond the reference (which never
checkpointed Adam moments -- resume restarted them from zero, SURVEY.md
section 5): they persist variables + optimizer state + PRNG key + step.
"""

import logging
import os
import pickle

import numpy as np

logger = logging.getLogger(__name__)

MASK_SUFFIX = ".weights_mask"
METADATA_KEY = "__metadata__"


def save_weights(fname, variables, metadata=None, include_masks=False):
    """Name-keyed save. MADE masks are excluded by default -- like the
    reference (they are non-trainable and regenerated deterministically at
    load, `API.py:33-36`)."""
    arrays = {
        k: np.asarray(v)
        for k, v in variables.items()
        if include_masks or not k.endswith(MASK_SUFFIX)
    }
    if metadata is not None:
        arrays[METADATA_KEY] = np.frombuffer(pickle.dumps(metadata), dtype=np.uint8)
    tmp = fname + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, fname)


def load_weights(fname, variables):
    """In-place name-matched restore into `variables` (a dict). Returns the
    metadata dict ({} if none). Shape mismatches and missing names warn and
    skip, matching `GANcheckpoints.py:42-52`."""
    metadata = {}
    with np.load(fname, allow_pickle=False) as f:
        stored = {k: f[k] for k in f.files}
    if METADATA_KEY in stored:
        metadata = pickle.loads(stored.pop(METADATA_KEY).tobytes())
    for name in variables:
        if name.endswith(MASK_SUFFIX) and name not in stored:
            continue  # regenerated at init
        if name not in stored:
            logger.warning("checkpoint %s missing param %s; skipping", fname, name)
            continue
        arr = stored[name]
        if tuple(arr.shape) != tuple(np.shape(variables[name])):
            logger.warning(
                "shape mismatch for %s: checkpoint %s vs model %s; skipping",
                name,
                arr.shape,
                np.shape(variables[name]),
            )
            continue
        variables[name] = arr
    for name in stored:
        if name not in variables:
            logger.warning("checkpoint %s has unused param %s", fname, name)
    return metadata


def _flatten_pytree(tree):
    import jax

    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_train_state(fname, state):
    """state: arbitrary pytree (variables, opt_state, rng, step, ...)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    tmp = fname + ".tmp.npz"
    with open(tmp, "wb") as f:
        # uncompressed: train states are ~3x the weights (Adam moments) and
        # zlib on float noise costs minutes per epoch on a small host for a
        # few percent size win
        np.savez(f, **arrays)
    os.replace(tmp, fname)


def load_train_state(fname):
    import jax

    with np.load(fname, allow_pickle=False) as f:
        stored = {k: f[k] for k in f.files}
    treedef = pickle.loads(stored.pop("__treedef__").tobytes())
    flat = [stored[f"leaf_{i}"] for i in range(len(stored))]
    return jax.tree_util.tree_unflatten(treedef, flat)


# --- orbax backend (optional) --------------------------------------------
# For multi-host / sharded checkpoints: orbax writes per-shard array files
# and restores onto the current mesh; the npz paths above stay the simple
# single-host default.


def save_train_state_orbax(path, state):
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), jax.device_get(state), force=True)
        ckptr.wait_until_finished()


def load_train_state_orbax(path, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))
