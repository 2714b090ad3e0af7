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
DIRECT_MASK_SUFFIX = "_output_D" + MASK_SUFFIX

# Checkpoint ABI version, stored as metadata['format_version'] in both
# weight files and train-state files. History:
#   v0  -- unversioned: the reference's layout (`GANcheckpoints.py:11-57`)
#          and every npe_tpu file written before versioning existed. Read
#          natively (the v0 layout IS the v1 layout minus the version key).
#   v1  -- identical array layout; adds the version stamp, and train states
#          may carry low-precision Adam moments (cfg['moments_dtype'],
#          train_step._scale_by_adam_lp) -- dtype rides in each npz array
#          header, so v1 readers need no special casing.
FORMAT_VERSION = 1


def _check_version(metadata, fname):
    ver = (metadata or {}).get("format_version", 0)
    if ver > FORMAT_VERSION:
        raise ValueError(
            f"{fname} has checkpoint format_version {ver}, newer than this "
            f"build's {FORMAT_VERSION}; upgrade npe_tpu to read it"
        )
    return metadata


def made_orderings_of(variables):
    """Recover each MADE net's latent ordering from its direct-input (DIML)
    mask. The mask is (ordering+1)[:, None] <= ordering[None, :] over a
    permutation of 0..D-1, so column j has exactly ordering[j] ones --
    the ordering is the column sum. Returns {made_name: ordering list}."""
    out = {}
    for k, v in variables.items():
        if k.endswith(DIRECT_MASK_SUFFIX):
            name = k[: -len(DIRECT_MASK_SUFFIX)]
            out[name] = np.asarray(v).sum(axis=0).astype(np.int64).tolist()
    return out


def restore_made_masks(variables, metadata):
    """Regenerate MADE masks from the 'made_orderings' stashed in checkpoint
    metadata (closing the reference's gap: `API.py:33-36` re-derives masks by
    replaying the hardcoded seed-1234 shuffle protocol, which silently breaks
    if the checkpoint was trained with a different seed or shuffle count).
    In-place on `variables`; no-op for checkpoints without the metadata."""
    orderings = (metadata or {}).get("made_orderings")
    if not orderings:
        return variables
    from npe_tpu.ops.made import made_masks

    for name, ordering in orderings.items():
        ikey = f"{name}_input{MASK_SUFFIX}"
        if ikey not in variables:
            continue
        hidden = [np.shape(variables[ikey])[1]]
        while f"{name}_layer_{len(hidden)}{MASK_SUFFIX}" in variables:
            hidden.append(np.shape(variables[f"{name}_layer_{len(hidden)}{MASK_SUFFIX}"])[1])
        layer_masks, direct = made_masks(len(ordering), hidden, ordering=ordering)
        names = [ikey] + [f"{name}_layer_{i}{MASK_SUFFIX}" for i in range(1, len(hidden))]
        for n, m in zip(names, layer_masks[:-1]):
            variables[n] = m
        variables[f"{name}_output_W{MASK_SUFFIX}"] = layer_masks[-1]
        variables[f"{name}{DIRECT_MASK_SUFFIX}"] = direct
    return variables


def _unique_tmp(fname):
    """Per-writer tmp path for the atomic tmp+rename protocol. A SHARED tmp
    name (the old `fname + '.tmp.npz'`) let two concurrent writers of the
    same checkpoint (two resumed trainers on one out-dir -- observed round 3)
    race: the first rename consumes the file and the loser dies on
    FileNotFoundError, killing an hours-long run over a save."""
    import threading
    import uuid

    return f"{fname}.tmp-{os.getpid()}-{threading.get_ident()}-{uuid.uuid4().hex[:8]}.npz"


def save_weights(fname, variables, metadata=None, include_masks=False, compress=False):
    """Name-keyed save. MADE masks are excluded by default -- like the
    reference (they are non-trainable and regenerated deterministically at
    load, `API.py:33-36`) -- but each MADE ordering rides in the metadata so
    `load_weights` can regenerate the exact masks regardless of the mask
    seed the loading process would use.

    compress=False by default: zlib on ~200 MB of float noise costs over a
    minute per checkpoint on a small host for a few-percent size win (the
    reference used savez_compressed, `GANcheckpoints.py:24`; np.load reads
    both, so the on-disk ABI is unchanged)."""
    arrays = {
        k: np.asarray(v)
        for k, v in variables.items()
        if include_masks or not k.endswith(MASK_SUFFIX)
    }
    metadata = dict(metadata or {})
    metadata.setdefault("format_version", FORMAT_VERSION)
    orderings = made_orderings_of(variables)
    if orderings:
        metadata.setdefault("made_orderings", orderings)
    arrays[METADATA_KEY] = np.frombuffer(pickle.dumps(metadata), dtype=np.uint8)
    tmp = _unique_tmp(fname)
    try:
        with open(tmp, "wb") as f:
            (np.savez_compressed if compress else np.savez)(f, **arrays)
        os.replace(tmp, fname)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_weights(fname, variables):
    """In-place name-matched restore into `variables` (a dict). Returns the
    metadata dict ({} if none). Shape mismatches and missing names warn and
    skip, matching `GANcheckpoints.py:42-52`. MADE masks absent from the
    checkpoint are regenerated from the metadata's 'made_orderings' (falling
    back to whatever masks `variables` already carries from init)."""
    metadata = {}
    with np.load(fname, allow_pickle=False) as f:
        stored = {k: f[k] for k in f.files}
    if METADATA_KEY in stored:
        metadata = pickle.loads(stored.pop(METADATA_KEY).tobytes())
    _check_version(metadata, fname)
    restore_made_masks(variables, metadata)
    for name in variables:
        if name.endswith(MASK_SUFFIX) and name not in stored:
            continue  # regenerated above / at init
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


def save_train_state(fname, state, metadata=None):
    """state: arbitrary pytree (variables, opt_state, rng, step, ...).
    metadata (e.g. {'epoch', 'itr', 'learning_rate'}) rides in the file so a
    resume restores epoch/lr CONSISTENT with the opt state even when state
    saves are throttled to every Nth checkpoint (train.py state_every)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    metadata = dict(metadata or {})
    metadata.setdefault("format_version", FORMAT_VERSION)
    # numpy's npz format stores non-native dtypes (bfloat16 Adam moments,
    # cfg['moments_dtype']) as opaque void bytes -- record each leaf's true
    # dtype so load_train_state can view them back.
    metadata.setdefault(
        "leaf_dtypes", {k: str(v.dtype) for k, v in arrays.items() if k.startswith("leaf_")}
    )
    arrays["__metadata__"] = np.frombuffer(pickle.dumps(metadata), dtype=np.uint8)
    tmp = _unique_tmp(fname)
    try:
        with open(tmp, "wb") as f:
            # uncompressed: train states are ~3x the weights (Adam moments)
            # and zlib on float noise costs minutes per epoch on a small
            # host for a few percent size win
            np.savez(f, **arrays)
        os.replace(tmp, fname)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_train_state(fname):
    import jax

    with np.load(fname, allow_pickle=False) as f:
        stored = {k: f[k] for k in f.files}
    meta_raw = stored.pop("__metadata__", None)
    leaf_dtypes = {}
    if meta_raw is not None:
        meta = _check_version(pickle.loads(meta_raw.tobytes()), fname)
        leaf_dtypes = (meta or {}).get("leaf_dtypes", {})
    treedef = pickle.loads(stored.pop("__treedef__").tobytes())

    def fix_dtype(name, arr):
        want = leaf_dtypes.get(name)
        if want and arr.dtype.kind == "V":  # npz stored a non-native dtype as raw bytes
            import ml_dtypes  # registered extended dtypes (bfloat16, ...)

            del ml_dtypes
            return arr.view(np.dtype(want))
        return arr

    flat = [fix_dtype(f"leaf_{i}", stored[f"leaf_{i}"]) for i in range(len(stored))]
    return jax.tree_util.tree_unflatten(treedef, flat)


def train_state_metadata(fname):
    """Read only the metadata member of a train-state npz (cheap: one zip
    entry, no leaf arrays touched)."""
    with np.load(fname, allow_pickle=False) as f:
        if "__metadata__" not in f.files:
            return {}
        meta = pickle.loads(f["__metadata__"].tobytes())
    meta.pop("leaf_dtypes", None)  # internal (see save_train_state)
    return meta


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


# --- async checkpointing ---------------------------------------------------


class AsyncCheckpointer:
    """Overlap checkpoint device->host fetch + file write with training.

    Motivation (measured, see BENCHMARKS.md "axon tunnel"): the remote-TPU
    device->host link runs at ~4.3 MB/s, so fetching a full-IAN train state
    (~650 MB) stalls the training loop for minutes per checkpoint -- while
    the TPU itself sits idle. Device buffers in JAX are immutable and the
    functional train step allocates fresh ones, so a reference to the
    epoch-N state can be fetched from a worker thread while the main thread
    dispatches epoch N+1.

    At most one save is in flight (`submit` joins the previous one first):
    saves stay ordered, the extra device-memory footprint is bounded to one
    retained state, and the crash guarantee is unchanged from the sync path
    -- each file still lands via atomic tmp+rename (`save_weights`), and a
    crash loses at most the newest checkpoint. Call `wait()` before reading
    the files back (e.g. resume-in-process) and at end of training.

    Exceptions from the worker (including transient backend drops) are
    re-raised on the NEXT submit/wait so the trainer's own error handling
    (babysitter restart) still engages.
    """

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt"
        )
        self._inflight = None

    def submit(self, fn, *args, **kwargs):
        self.wait()
        self._inflight = self._pool.submit(fn, *args, **kwargs)

    def wait(self):
        if self._inflight is not None:
            f, self._inflight = self._inflight, None
            f.result()

    def close(self):
        self.wait()
        self._pool.shutdown(wait=True)
