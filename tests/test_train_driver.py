"""End-to-end train() driver smoke: the uint8 on-device staging path
(single-device with fused gather, and mesh-sharded), artifacts, resume.
Reference behavior: `train_IAN.py:378-573`."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from npe_tpu.training.train import train
from npe_tpu.utils.metrics_logging import read_records


def _overrides():
    return {"batch_size": 8, "batches_per_chunk": 2, "max_epochs": 1, "update_ratio": 1}


def test_train_driver_single_device(tmp_path):
    state = train(
        config="IAN_simple",
        dataset_spec="synthetic",
        num_examples=32,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        cfg_overrides=_overrides(),
        seed=3,
    )
    assert os.path.isfile(tmp_path / "IAN_simple.npz")
    assert os.path.isfile(tmp_path / "IAN_simple_train_state.npz")
    recs = read_records(str(tmp_path / "IAN_simpleMETRICS.jsonl"))
    assert len(recs) == 2  # one per chunk
    for r in recs:
        for v in r["metrics"].values():
            assert np.isfinite(v)
    # resume continues from epoch 1
    train(
        config="IAN_simple",
        dataset_spec="synthetic",
        num_examples=32,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        cfg_overrides={**_overrides(), "max_epochs": 2},
        seed=3,
        resume=True,
    )
    recs = read_records(str(tmp_path / "IAN_simpleMETRICS.jsonl"))
    assert [r["epoch"] for r in recs] == [0, 0, 1, 1]


def test_restore_masks_prefers_checkpointed():
    """Resume must keep the checkpointed MADE masks (the persisted IAF
    ordering), only backfilling from fresh init when a mask is absent."""
    from npe_tpu.training.train import restore_masks

    fresh = {"parts": {"state": {"a.weights_mask": np.ones(4), "b.weights_mask": np.full(4, 2.0)}}}
    loaded = {"parts": {"state": {"a.weights_mask": np.full(4, 7.0)}}}
    out = restore_masks(loaded, fresh)
    np.testing.assert_array_equal(out["parts"]["state"]["a.weights_mask"], 7.0)
    np.testing.assert_array_equal(out["parts"]["state"]["b.weights_mask"], 2.0)


def test_train_driver_validation_logging(tmp_path):
    """--valid-dataset wires validation_pixel_accuracy into the epoch loop
    and logs a 'validation' record per checkpoint epoch."""
    train(
        config="IAN_simple",
        dataset_spec="synthetic",
        num_examples=32,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        cfg_overrides=_overrides(),
        seed=3,
        valid_dataset_spec="synthetic",
        num_valid_examples=32,
    )
    recs = read_records(str(tmp_path / "IAN_simpleMETRICS.jsonl"))
    vrecs = [r for r in recs if "validation" in r]
    assert len(vrecs) == 1
    assert np.isfinite(vrecs[0]["validation"]["test_error"])
    assert np.isfinite(vrecs[0]["validation"]["mse"])
    assert np.isfinite(vrecs[0]["validation"]["encoder_fid"])


def test_train_driver_mesh(tmp_path):
    from npe_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices on 'data'
    train(
        config="IAN_simple",
        dataset_spec="synthetic",
        num_examples=32,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        cfg_overrides=_overrides(),
        seed=3,
        mesh=mesh,
    )
    recs = read_records(str(tmp_path / "IAN_simpleMETRICS.jsonl"))
    assert len(recs) == 2
    for r in recs:
        for v in r["metrics"].values():
            assert np.isfinite(v)


def test_train_driver_async_checkpoint(tmp_path):
    """--async-checkpoint moves the fetch+save to a worker thread (and turns
    off step-buffer donation so the in-flight state stays fetchable). The
    training math is untouched: final weights must be bit-identical to the
    sync path, and the async-written checkpoint must be loadable."""
    from npe_tpu.utils import checkpoints

    outs = {}
    for mode, sub in (("sync", "a"), ("async", "b")):
        out = tmp_path / sub
        train(
            config="tests/tiny_ian.py",
            dataset_spec="synthetic",
            num_examples=32,
            out_dir=str(out),
            pics_dir=str(out / "pics"),
            checkpoint_grids=False,
            cfg_overrides={**_overrides(), "max_epochs": 2},
            seed=3,
            async_checkpoint=(mode == "async"),
        )
        outs[mode] = out

    ws = {}
    for mode, out in outs.items():
        ws[mode] = {}
        meta = checkpoints.load_weights(str(out / "tiny_ian.npz"), ws[mode])
        assert meta["epoch"] == 1
        assert os.path.isfile(out / "tiny_ian_train_state.npz")
    assert set(ws["sync"]) == set(ws["async"])
    for k in ws["sync"]:
        np.testing.assert_array_equal(ws["sync"][k], ws["async"][k], err_msg=k)


def test_fid_feature_basis_persists_across_resume(tmp_path):
    """The frozen encoder-FID feature basis is written at the first
    validation checkpoint and reloaded on resume -- a crash-resume must not
    silently rebase the FID curve on a later encoder."""
    from npe_tpu.utils import checkpoints

    kw = dict(
        config="tests/tiny_ian.py",
        dataset_spec="synthetic",
        num_examples=32,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        seed=3,
        valid_dataset_spec="synthetic",
        num_valid_examples=32,
    )
    train(cfg_overrides=_overrides(), **kw)
    basis = tmp_path / "tiny_ian_fid_basis.npz"
    assert basis.is_file()
    meta = checkpoints.load_weights(str(basis), {})
    assert meta["epoch"] == 0

    train(cfg_overrides={**_overrides(), "max_epochs": 2}, resume=True, **kw)
    # still the epoch-0 basis, not re-derived from the epoch-1 encoder
    meta = checkpoints.load_weights(str(basis), {})
    assert meta["epoch"] == 0
    recs = read_records(str(tmp_path / "tiny_ianMETRICS.jsonl"))
    vrecs = [r for r in recs if "validation" in r]
    assert len(vrecs) == 2
    assert all(np.isfinite(r["validation"]["encoder_fid"]) for r in vrecs)
