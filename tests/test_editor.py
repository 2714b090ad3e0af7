"""Headless NPE edit-engine integration tests -- the editor behavior the
reference could only verify by hand (SURVEY.md section 4)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def session():
    from npe_tpu.editor.engine import EditSession

    return EditSession(config="IAN_simple", seed=0)


def _fake_image(h=64, w=64):
    rng = np.random.RandomState(3)
    return (rng.rand(3, h, w).astype(np.float32) * 2 - 1) * 0.5


def test_infer_reconstruction_state(session):
    im = session.infer(_fake_image())
    assert im.shape == (3, 64, 64)
    assert session.Z.shape == (100,)
    # ERROR = GIM - RECON in tanh units
    np.testing.assert_allclose(
        session.ERROR, session.GIM - session.RECON, atol=1e-5
    )
    assert not session.sample_flag


def test_paint_stroke_moves_latents_and_composites(session):
    session.infer(_fake_image())
    z_before = np.asarray(session.Z).copy()
    im = session.paint_stroke(10, 10, 20, 20, (255, 0, 0))
    z_after = np.asarray(session.Z)
    assert not np.allclose(z_before, z_after)
    assert im.shape == (3, 64, 64)
    # composite identity: IM == RECON + MASK*DELTA + (1-MASK)*ERROR, with
    # MASK in [0,1] -- so IM must lie in the convex hull of RECON+DELTA and
    # RECON+ERROR
    lo = np.minimum(session.RECON + session.DELTA, session.RECON + session.ERROR) - 1e-4
    hi = np.maximum(session.RECON + session.DELTA, session.RECON + session.ERROR) + 1e-4
    assert np.all(im >= lo) and np.all(im <= hi)


def test_paint_on_sample_skips_composite(session):
    session.sample(7)
    assert session.sample_flag
    im = session.paint_stroke(5, 5, 15, 15, (0, 0, 255))
    # sample path displays the raw decode
    np.testing.assert_allclose(im, session.decode_current(), atol=1e-5)


def test_scroll_lightens_patch(session):
    session.infer(_fake_image())
    before = session.decode_current()[:, 8:16, 8:16].mean()
    session.scroll_patch(8, 8, 16, 16, +1)
    after = session.decode_current()[:, 8:16, 8:16].mean()
    assert after > before


def test_set_latents_roundtrip(session):
    session.infer(_fake_image())
    zg = np.zeros((10, 10), np.float32)
    zg[0, 0] = 1.0
    session.set_latents(zg)
    np.testing.assert_allclose(session.Z_grid, zg, atol=1e-6)


def test_editor_works_with_full_ian():
    """The editor is model-generic (plat contract): the full IAN config
    (IAF latent path + RGB-Beta decoder) must drive the same session."""
    from npe_tpu.editor.engine import EditSession

    s = EditSession(config="IAN", seed=0)
    s.infer(_fake_image())
    z0 = np.asarray(s.Z).copy()
    s.paint_stroke(8, 8, 24, 24, (255, 255, 255))
    assert not np.allclose(z0, np.asarray(s.Z))
    assert np.isfinite(s.IM).all()


def test_bf16_session_close_to_f32(session):
    import jax.numpy as jnp

    from npe_tpu.editor.engine import EditSession

    s16 = EditSession(config="IAN_simple", seed=0, dtype=jnp.bfloat16)
    img = _fake_image()
    session.infer(img)
    s16.infer(img)
    assert np.mean(np.abs(np.asarray(s16.Z) - np.asarray(session.Z))) < 0.2
    im16 = s16.paint_stroke(10, 10, 20, 20, (255, 0, 0))
    assert im16.dtype == np.float32 and np.isfinite(im16).all()


def test_reset_and_update_gim(session):
    session.infer(_fake_image())
    session.paint_stroke(0, 0, 12, 12, (0, 255, 0))
    painted = session.IM.copy()
    session.update_gim()  # promote to ground truth
    np.testing.assert_allclose(session.GIM, painted, atol=1e-6)
    session.reset()
    np.testing.assert_allclose(session.GIM, painted, atol=1e-6)


def test_undo_stack(session):
    """undo() reverts strokes/scrolls/samples one at a time back to the
    post-infer state; infer clears the stack."""
    session.infer(_fake_image())
    assert not session.can_undo
    z0 = np.asarray(session.Z).copy()
    im0 = session.IM.copy()
    session.paint_stroke(5, 5, 15, 15, (0, 255, 0))
    session.scroll_patch(20, 20, 30, 30, +1)
    assert session.can_undo
    session.undo()  # revert scroll
    session.undo()  # revert stroke
    np.testing.assert_allclose(np.asarray(session.Z), z0, atol=0)
    np.testing.assert_allclose(session.IM, im0, atol=0)
    assert not session.can_undo
    assert session.undo() is None


def test_user_mask_accumulates_and_floors_composite(session):
    """Strokes accumulate USER_MASK in the brush box (`NPE.py:221` intent);
    a saturated user mask pins the composite to the generator output in
    that region."""
    from npe_tpu.editor.engine import USER_MASK_RATE

    session.infer(_fake_image())
    assert float(session.USER_MASK.max()) == 0.0
    session.paint_stroke(10, 10, 20, 20, (255, 0, 0))
    assert np.allclose(session.USER_MASK[10:20, 10:20], USER_MASK_RATE)
    assert float(session.USER_MASK[:5, :5].max()) == 0.0
    # saturate the box and check the composite equals decode(Z) there
    session.USER_MASK[10:20, 10:20] = 1.0
    im = session.set_latents(session.Z_grid)
    xh = session.decode_current()
    np.testing.assert_allclose(
        im[:, 12:18, 12:18], xh[:, 12:18, 12:18], rtol=1e-4, atol=1e-4
    )
    # infer clears it
    session.infer(_fake_image())
    assert float(session.USER_MASK.max()) == 0.0


def test_soft_brush_mask_and_stroke(session):
    """sigma is a runtime knob (`api.soft_patch_mask`, the reference's gk
    localizer `NPE.py:167-175`): 0 == hard box bitwise; >0 feathers."""
    from npe_tpu.api import patch_mask, soft_patch_mask

    hard = np.asarray(patch_mask(64, 64, 10, 12, 20, 22))
    np.testing.assert_array_equal(hard, np.asarray(soft_patch_mask(64, 64, 10, 12, 20, 22, 0.0)))
    soft = np.asarray(soft_patch_mask(64, 64, 10, 12, 20, 22, 1.5))
    assert np.allclose(soft[12:22, 10:20], 1.0)  # 1 inside the box
    assert 0 < soft[12, 5] < soft[12, 9] < 1.0  # monotone falloff outside
    session.infer(_fake_image())
    z0 = np.asarray(session.Z).copy()
    im = session.paint_stroke(10, 10, 20, 20, (255, 0, 0), sigma=1.5)
    assert np.isfinite(im).all()
    assert not np.allclose(z0, np.asarray(session.Z))
    # feathered USER_MASK accumulation reaches outside the box
    assert session.USER_MASK[15, 25] > 0


def test_fork_shares_programs_and_isolates_state(session):
    s2 = session.fork()
    # shared compiled programs + weights (no re-trace for a second image)
    assert s2._paint_fn is session._paint_fn
    assert s2._encode_fn is session._encode_fn
    assert s2.variables is session.variables
    session.infer(_fake_image())
    z1 = np.asarray(session.Z).copy()
    s2.sample(7)
    assert not np.allclose(np.asarray(session.Z), np.asarray(s2.Z))
    np.testing.assert_array_equal(z1, np.asarray(session.Z))  # untouched
