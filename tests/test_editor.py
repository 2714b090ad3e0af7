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
