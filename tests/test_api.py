"""Plat API contract tests (reference `API.py:66-110`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    from npe_tpu.api import IAN

    return IAN(config_path="IAN_simple", seed=0)


def test_encode_decode_contract(model):
    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    z = model.encode_images(x)
    assert z.shape == (2, model.get_zdim())
    xh = model.sample_at(z)
    assert xh.shape == (2, 3, 64, 64)
    assert np.abs(xh).max() <= 1 + 1e-5


def test_imgrad_localized(model):
    """The lighten gradient must be nonzero and patch-dependent."""
    z = np.zeros((1, model.get_zdim()), np.float32)
    g1 = model.imgrad(8, 8, 16, 16, z)
    g2 = model.imgrad(40, 40, 60, 60, z)
    assert g1.shape == (1, model.get_zdim())
    assert np.abs(g1).max() > 0
    assert not np.allclose(g1, g2)


def test_imgrad_matches_slice_formulation(model):
    """Masked-mean gradient == gradient of the sliced-patch mean."""
    import jax
    import jax.numpy as jnp

    z = np.random.RandomState(1).randn(1, model.get_zdim()).astype(np.float32)
    c1, r1, c2, r2 = 4, 6, 20, 30
    g_masked = model.imgrad(c1, r1, c2, r2, z)

    mod, v = model.module, model.variables

    def sliced_loss(zz):
        xh = mod.decode(v, zz)  # NHWC
        return jnp.mean(xh[0, r1:r2, c1:c2, :])

    g_slice = jax.grad(sliced_loss)(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g_masked), np.asarray(g_slice), rtol=1e-3, atol=1e-6)


def test_imgradRGB_descends_toward_color(model):
    """A gradient step against imgradRGB must reduce the patch color loss
    (the NPE's paint update, `NPE.py:205-209`)."""
    zdim = model.get_zdim()
    z = np.zeros((1, zdim), np.float32)
    rgb = np.ones((1, 3, 64, 64), np.float32)  # push toward white
    c1, r1, c2, r2 = 16, 16, 32, 32

    def loss(zz):
        xh = model.sample_at(zz)
        p = xh[0, :, r1:r2, c1:c2]
        return float(np.mean((rgb[0, :, r1:r2, c1:c2] - p) ** 2))

    g = model.imgradRGB(c1, r1, c2, r2, rgb, z)
    z2 = z - 0.5 * g
    assert loss(z2) < loss(z)
