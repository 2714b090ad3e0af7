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


def test_mdblock_fused_matches_xla_mdblock():
    """The fused single-kernel MDBLOCK (interpret mode) equals the per-op
    XLA formulation (models/common.mdblock, train=False) and its custom-VJP
    gradient equals the XLA gradient."""
    import jax

    from npe_tpu.models.common import LRELU, VarBuilder, mdblock
    from npe_tpu.ops.pallas.mdcl_kernels import (
        mdblock_fused,
        stack_mdcl_taps,
        tap_offsets,
    )

    scales = [0, 2, 3]
    c = 8
    vb = VarBuilder(jax.random.PRNGKey(0))
    vb.mdcl("blk", c, c, scales)
    vb.mdcl("blk2", c, c, scales)
    for i in range(3):
        vb.bn(f"blkbnorm{i}", c)
    v = vb.v
    # non-trivial BN stats
    for i in range(3):
        v[f"blkbnorm{i}.mean"] = jnp.linspace(-0.2, 0.3, c)
        v[f"blkbnorm{i}.inv_std"] = jnp.linspace(0.8, 1.3, c)
        v[f"blkbnorm{i}.beta"] = jnp.linspace(-0.1, 0.1, c)
        v[f"blkbnorm{i}.gamma"] = jnp.linspace(0.9, 1.1, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, c)) * 0.5

    ref = mdblock(v, None, "blk", x, scales, LRELU, train=False)

    def affine(name):
        s = v[f"{name}.gamma"] * v[f"{name}.inv_std"]
        return s, v[f"{name}.beta"] - v[f"{name}.mean"] * s

    def taps(name):
        co = {s: v[f"blk{name}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
        return stack_mdcl_taps(v[f"blk{name}W"], v[f"blk{name}_coeff_base"], co, scales)

    affines = affine("blkbnorm0") + affine("blkbnorm1") + affine("blkbnorm2")
    t1 = taps("")
    t2 = taps("2")
    offs = tap_offsets(scales)

    fused = mdblock_fused(x, t1, t2, affines, offs, 4, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)

    g_ref = jax.grad(lambda x: jnp.sum(mdblock(v, None, "blk", x, scales, LRELU, False) ** 2))(x)
    g_fused = jax.grad(
        lambda x: jnp.sum(mdblock_fused(x, t1, t2, affines, offs, 4, True) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_rgb_beta_head_pallas_matches_packed():
    """The fused Pallas RGB-Beta head (interpret mode) equals the XLA packed
    head and the plain head; its custom-VJP gradient matches XLA's."""
    import jax

    from npe_tpu.models import get_config
    from npe_tpu.models.common import _composed_mdcl_kernel
    from npe_tpu.ops.pallas.mdcl_kernels import rgb_beta_head_pallas

    m = get_config("IAN")
    v = m.init(jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 128)) * 0.3
    plain = m.rgb_beta_head(v, h, mode="plain")

    scales = [2, 3, 4]
    k_trunk = jnp.concatenate(
        [_composed_mdcl_kernel(v, n, scales) for n in ("R", "G_a", "B_a")], axis=-1
    )
    k_g = _composed_mdcl_kernel(v, "G_b", scales)
    k_b = _composed_mdcl_kernel(v, "B_b", scales)

    fused = rgb_beta_head_pallas(h, k_trunk, k_g, k_b, 4, 1, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=1e-4, atol=1e-5)

    g_ref = jax.grad(lambda h: jnp.sum(m.rgb_beta_head(v, h, mode="packed") ** 2))(h)
    g_fused = jax.grad(
        lambda h: jnp.sum(rgb_beta_head_pallas(h, k_trunk, k_g, k_b, 4, 1, True) ** 2)
    )(h)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_rgb_beta_head_hybrid_matches_plain():
    """The hybrid head (XLA packed trunk conv + Pallas autoregressive-tail
    kernel, interpret mode on CPU) equals the plain head; its custom-VJP
    gradient matches the packed head's."""
    import jax

    from npe_tpu.models import get_config

    m = get_config("IAN")
    v = m.init(jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 128)) * 0.3

    plain = m.rgb_beta_head(v, h, mode="plain")
    hybrid = m.rgb_beta_head(v, h, mode="hybrid")
    np.testing.assert_allclose(np.asarray(hybrid), np.asarray(plain), rtol=1e-4, atol=1e-5)

    g_ref = jax.grad(lambda h: jnp.sum(m.rgb_beta_head(v, h, mode="packed") ** 2))(h)
    g_hyb = jax.grad(lambda h: jnp.sum(m.rgb_beta_head(v, h, mode="hybrid") ** 2))(h)
    np.testing.assert_allclose(np.asarray(g_hyb), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_mdblock_fused_dispatch_path(monkeypatch):
    """Force the fused gate on (MDBLOCK_FUSED='force' -> interpret mode on
    CPU) so the IN-SITU dispatch inside models/common.mdblock -- the
    _stacked_mdcl_taps stacking and _bn_affine assembly the direct-call test
    above bypasses -- is exercised and equals the per-op XLA path."""
    import jax

    from npe_tpu.models import common
    from npe_tpu.models.common import LRELU, VarBuilder, mdblock

    scales = [0, 2]
    c = 8
    vb = VarBuilder(jax.random.PRNGKey(3))
    vb.mdcl("blk", c, c, scales)
    vb.mdcl("blk2", c, c, scales)
    for i in range(3):
        vb.bn(f"blkbnorm{i}", c)
    v = vb.v
    for i in range(3):
        v[f"blkbnorm{i}.mean"] = jnp.linspace(-0.2, 0.3, c)
        v[f"blkbnorm{i}.inv_std"] = jnp.linspace(0.8, 1.3, c)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, c)) * 0.5

    ref = mdblock(v, None, "blk", x, scales, LRELU, train=False)
    assert not common._mdblock_fused_enabled()  # CPU default: off
    monkeypatch.setattr(common, "MDBLOCK_FUSED", "force")
    assert common._mdblock_fused_enabled()
    fused = mdblock(v, None, "blk", x, scales, LRELU, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)
