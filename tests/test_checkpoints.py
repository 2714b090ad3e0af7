"""Checkpoint ABI tests (reference `GANcheckpoints.py:11-57` contract)."""

import numpy as np

from npe_tpu.utils.checkpoints import (
    load_train_state,
    load_weights,
    save_train_state,
    save_weights,
)
from npe_tpu.utils.metrics_logging import MetricsLogger, read_records


def test_save_load_roundtrip(tmp_path):
    f = str(tmp_path / "w.npz")
    v = {"a.W": np.arange(6, dtype=np.float32).reshape(2, 3), "bn.mean": np.ones(3, np.float32)}
    save_weights(f, v, metadata={"epoch": 7, "learning_rate": 1e-4})
    v2 = {"a.W": np.zeros((2, 3), np.float32), "bn.mean": np.zeros(3, np.float32)}
    meta = load_weights(f, v2)
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(v2["a.W"], v["a.W"])
    np.testing.assert_array_equal(v2["bn.mean"], v["bn.mean"])


def test_shape_mismatch_warns_and_skips(tmp_path, caplog):
    f = str(tmp_path / "w.npz")
    save_weights(f, {"a.W": np.ones((2, 3), np.float32)})
    v2 = {"a.W": np.zeros((4, 4), np.float32), "new.W": np.zeros(2, np.float32)}
    load_weights(f, v2)
    np.testing.assert_array_equal(v2["a.W"], 0)  # skipped, untouched
    np.testing.assert_array_equal(v2["new.W"], 0)  # missing, untouched


def test_masks_excluded_and_regenerated(tmp_path):
    f = str(tmp_path / "w.npz")
    v = {"m.weights_mask": np.ones((3, 3), np.float32), "a.W": np.ones(2, np.float32)}
    save_weights(f, v)
    v2 = {"m.weights_mask": np.zeros((3, 3), np.float32), "a.W": np.zeros(2, np.float32)}
    load_weights(f, v2)
    np.testing.assert_array_equal(v2["m.weights_mask"], 0)  # left to init-time value
    np.testing.assert_array_equal(v2["a.W"], 1)


def test_train_state_roundtrip(tmp_path):
    f = str(tmp_path / "state.npz")
    state = {"vars": {"w": np.ones(3)}, "step": np.int64(42), "nested": [np.zeros(2), np.ones(1)]}
    save_train_state(f, state)
    out = load_train_state(f)
    assert int(out["step"]) == 42
    np.testing.assert_array_equal(out["vars"]["w"], 1)


def test_train_state_metadata_roundtrip(tmp_path):
    """Metadata rides inside the state npz (resume consistency when state
    saves are throttled, train.py state_every) and loading ignores it."""
    from npe_tpu.utils.checkpoints import train_state_metadata

    f = str(tmp_path / "state.npz")
    state = {"w": np.ones(3)}
    save_train_state(f, state, metadata={"epoch": 7, "learning_rate": 1e-4})
    meta = train_state_metadata(f)
    assert meta["epoch"] == 7 and meta["learning_rate"] == 1e-4
    np.testing.assert_array_equal(load_train_state(f)["w"], 1)
    # caller-less saves still stamp the ABI version (and nothing else)
    save_train_state(f, state)
    from npe_tpu.utils.checkpoints import FORMAT_VERSION

    assert train_state_metadata(f) == {"format_version": FORMAT_VERSION}


def test_format_version_stamped_and_v0_reads(tmp_path):
    """Every new file carries format_version; legacy v0 files (reference
    `GANcheckpoints.py` layout / pre-versioning npe_tpu files, i.e. no
    version key -- possibly no metadata at all) still load; files from a
    NEWER format refuse with a clear error."""
    import pickle

    import pytest

    from npe_tpu.utils.checkpoints import FORMAT_VERSION, train_state_metadata

    f = str(tmp_path / "w.npz")
    v = {"a.W": np.ones(2, np.float32)}
    save_weights(f, v)
    assert load_weights(f, dict(v)).get("format_version") == FORMAT_VERSION

    # v0 weights: raw reference-style npz, no metadata member at all
    f0 = str(tmp_path / "v0.npz")
    np.savez(f0, **{"a.W": np.full(2, 3.0, np.float32)})
    v2 = {"a.W": np.zeros(2, np.float32)}
    assert load_weights(f0, v2) == {}
    np.testing.assert_array_equal(v2["a.W"], 3.0)

    # v0 train state: metadata without a version key
    fs = str(tmp_path / "s0.npz")
    save_train_state(fs, {"w": np.ones(3)}, metadata={"epoch": 2, "format_version": 0})
    assert train_state_metadata(fs)["format_version"] == 0
    np.testing.assert_array_equal(load_train_state(fs)["w"], 1)

    # future-version files refuse loudly
    fnew = str(tmp_path / "future.npz")
    arrays = {"a.W": np.ones(2, np.float32)}
    arrays["__metadata__"] = np.frombuffer(
        pickle.dumps({"format_version": FORMAT_VERSION + 1}), dtype=np.uint8
    )
    np.savez(fnew, **arrays)
    with pytest.raises(ValueError, match="format_version"):
        load_weights(fnew, {"a.W": np.zeros(2, np.float32)})


def test_orbax_backend_roundtrip(tmp_path):
    import pytest

    try:
        from npe_tpu.utils.checkpoints import load_train_state_orbax, save_train_state_orbax
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax unavailable")
    state = {"w": np.ones((3, 2), np.float32), "step": np.full((), 7, np.int32)}
    p = str(tmp_path / "ckpt")
    save_train_state_orbax(p, state)
    out = load_train_state_orbax(p, like=state)
    np.testing.assert_array_equal(out["w"], state["w"])
    assert int(out["step"]) == 7


def test_metrics_logger(tmp_path):
    f = str(tmp_path / "m.jsonl")
    log = MetricsLogger(f, reinitialize=True)
    log.log(epoch=0, metrics={"loss": 1.0})
    log.log(epoch=1, metrics={"loss": 0.5})
    with open(f, "a") as fh:
        fh.write('{"torn": tru')  # torn line, no newline
    recs = read_records(f)
    assert len(recs) == 2
    assert recs[1]["epoch"] == 1
    assert "_stamp" in recs[0]


def test_made_ordering_rides_in_metadata(tmp_path):
    """Weights-only round-trip with a NON-default mask seed: the checkpoint's
    metadata carries each MADE ordering, so a loader whose init used the
    default seed still reconstructs the exact trained masks (closing the
    reference's hardcoded-seed assumption, `API.py:33-36`)."""
    import jax

    from npe_tpu.ops.made import made_init

    f = str(tmp_path / "w.npz")
    # ordering from seed 777 differs from the default 1234
    v = made_init(jax.random.PRNGKey(0), "l_IAF_mu", 12, [12], seed=777, n_shuffles=3)
    default = made_init(jax.random.PRNGKey(0), "l_IAF_mu", 12, [12])
    mask_keys = [k for k in v if k.endswith(".weights_mask")]
    assert any(not np.array_equal(v[k], default[k]) for k in mask_keys)

    save_weights(f, v, metadata={"epoch": 3})
    # the loading process inits with the DEFAULT protocol
    v2 = made_init(jax.random.PRNGKey(1), "l_IAF_mu", 12, [12])
    meta = load_weights(f, v2)
    assert meta["epoch"] == 3
    assert "made_orderings" in meta
    for k in mask_keys:
        np.testing.assert_array_equal(v2[k], v[k]), k
    # weights restored too
    np.testing.assert_array_equal(v2["l_IAF_mu_input.W"], v["l_IAF_mu_input.W"])


def test_packed_device_get_matches_device_get():
    """packed_device_get must reproduce jax.device_get exactly across mixed
    dtypes, shapes, and nesting (it is the checkpoint fetch path)."""
    import jax
    import jax.numpy as jnp
    from npe_tpu.utils.fetch import packed_device_get

    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) + 0.5,
        "b": {"w": jnp.ones((3, 1, 2), jnp.float32) * -2, "n": jnp.arange(4, dtype=jnp.int32)},
        "c": [jnp.zeros((), jnp.float32), jnp.array(7, jnp.int32), jnp.ones(5, jnp.bfloat16)],
    }
    want = jax.device_get(tree)
    got = packed_device_get(tree)
    flat_w, td_w = jax.tree_util.tree_flatten(want)
    flat_g, td_g = jax.tree_util.tree_flatten(got)
    assert td_w == td_g
    for w, g in zip(flat_w, flat_g):
        assert w.dtype == g.dtype and w.shape == g.shape
        np.testing.assert_array_equal(np.asarray(w, np.float32), np.asarray(g, np.float32))


def test_concurrent_saves_to_same_file_are_safe(tmp_path):
    """Two writers saving the same checkpoint path concurrently (two resumed
    trainers sharing an out-dir -- observed round 3) must both succeed: the
    tmp file of the atomic tmp+rename protocol is per-writer, so one writer's
    rename can never consume the other's tmp (the old shared name died with
    FileNotFoundError). The surviving file must be a valid npz."""
    import concurrent.futures

    import numpy as np

    from npe_tpu.utils import checkpoints as C

    fname = str(tmp_path / "w.npz")
    variables = {f"p{i}.W": np.full((64, 64), float(i), np.float32) for i in range(8)}

    def save(tag):
        C.save_weights(fname, variables, {"writer": tag})
        return tag

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(save, t) for t in range(16)]
        for f in futs:
            f.result()  # no FileNotFoundError from a stolen tmp

    target = {k: np.zeros((64, 64), np.float32) for k in variables}
    meta = C.load_weights(fname, target)
    assert "writer" in meta
    for i in range(8):
        np.testing.assert_array_equal(target[f"p{i}.W"], variables[f"p{i}.W"])
    leftovers = [p for p in tmp_path.iterdir() if ".tmp-" in p.name]
    assert not leftovers, leftovers
