"""Pallas kernels, run in interpreter mode on CPU (compiled path exercises
on TPU via the editor/bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.pallas.editor_kernels import blur_matrix, edit_tail, edit_tail_reference


def test_blur_matrix_matches_scipy():
    import scipy.ndimage

    rng = np.random.RandomState(0)
    v = rng.rand(64).astype(np.float32)
    bm = np.asarray(blur_matrix(64, 0.7))
    np.testing.assert_allclose(
        bm @ v, scipy.ndimage.gaussian_filter1d(v, 0.7), rtol=1e-4, atol=1e-5
    )
    # 2-D via B m B^T
    m = rng.rand(64, 64).astype(np.float32)
    np.testing.assert_allclose(
        bm @ m @ bm.T, scipy.ndimage.gaussian_filter(m, 0.7), rtol=1e-3, atol=1e-5
    )


def test_edit_tail_kernel_matches_reference():
    rng = np.random.RandomState(1)
    xh = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    recon = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    err = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 0.1)
    out = edit_tail(xh, recon, err, interpret=True)
    ref = edit_tail_reference(xh, recon, err, blur_matrix(64, 0.7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_edit_tail_matches_engine_math():
    """The fused kernel must equal the engine's scipy-parity formulation."""
    from npe_tpu.editor.engine import _mask_and_composite

    rng = np.random.RandomState(2)
    xh = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    recon = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    err = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 0.1)
    im_engine, _, _ = _mask_and_composite(xh, recon, err)
    im_kernel = edit_tail(xh, recon, err, interpret=True)
    np.testing.assert_allclose(np.asarray(im_kernel), np.asarray(im_engine), rtol=1e-3, atol=1e-4)


def test_stage_chunk_equals_host_path():
    """The wired training path (raw uint8 loader + on-device stage_chunk)
    must produce exactly what the old host-side conversion produced."""
    from npe_tpu.data import data_loader, get_dataset
    from npe_tpu.ops.pallas.staging import stage_chunk
    from npe_tpu.utils.ranges import to_tanh

    cfg = {"batch_size": 4, "batches_per_chunk": 2}
    ds = get_dataset("synthetic", num_examples=18)
    old = list(data_loader(cfg, ds, offset=2, shuffle=True, seed=9))
    new = list(data_loader(cfg, ds, offset=2, shuffle=True, seed=9, raw=True))
    assert len(old) == len(new) and new[0].dtype == np.uint8
    perm = np.random.RandomState(0).permutation(len(old[0]))
    for f32_chunk, u8_chunk in zip(old, new):
        want = f32_chunk[perm].transpose(0, 2, 3, 1)
        got = np.asarray(stage_chunk(u8_chunk, perm, use_pallas=False))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(want, to_tanh(np.float32(u8_chunk[perm])).transpose(0, 2, 3, 1))
        # no-perm variant (the sharded-mesh path)
        got2 = np.asarray(stage_chunk(u8_chunk[perm], use_pallas=False))
        np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)


def test_stage_uint8_to_tanh():
    from npe_tpu.ops.pallas.staging import stage_uint8_to_tanh

    rng = np.random.RandomState(3)
    chunk = rng.randint(0, 256, (4, 3, 16, 16), dtype=np.uint8)
    out = np.asarray(stage_uint8_to_tanh(jnp.asarray(chunk), interpret=True))
    expect = (2.0 * (chunk.astype(np.float32) / 255.0) - 1.0).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
    assert out.min() >= -1 - 1e-6 and out.max() <= 1 + 1e-6


def test_edit_tail_user_mask():
    """A saturated user mask forces the composite to the generator output
    (mask=1 -> IM = RECON + DELTA = decode), regardless of DELTA size; the
    kernel and jnp paths agree."""
    rng = np.random.RandomState(5)
    xh = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    recon = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 2 - 1)
    err = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 0.2)
    um = jnp.ones((64, 64), jnp.float32)
    out = edit_tail(xh, recon, err, um, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xh), rtol=1e-5, atol=1e-5)
    ref = edit_tail_reference(xh, recon, err, blur_matrix(64, 0.7), um)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
