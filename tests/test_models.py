"""Model-zoo shape & contract tests (the reference's de-facto graph-shape
smoke checks, `IAN.py:113`, made into real assertions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from npe_tpu.models import REGISTRY, get_config


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_shapes_and_determinism(name, rng):
    m = REGISTRY[name]
    v = m.init(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    mu, ls, feats = m.encode_stats(v, x)
    assert mu.shape == ls.shape == (2, m.NUM_LATENTS)
    assert [f.shape for f in feats] == [
        (2, 32, 32, 128),
        (2, 16, 16, 256),
        (2, 8, 8, 512),
        (2, 4, 4, 1024),
    ]
    z = m.encode(v, x)
    xh = m.decode(v, z)
    assert xh.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(xh))) <= 1.0 + 1e-5  # tanh / beta range
    logits = m.discrim_logits(v, feats[-1])
    assert logits.shape == (2, m.N_DISCRIM_CLASSES)
    # determinism
    np.testing.assert_array_equal(np.asarray(m.encode(v, x)), np.asarray(z))


@pytest.mark.parametrize("name", ["IAN", "IANv1"])
def test_iaf_latent_path(name, rng):
    m = REGISTRY[name]
    v = m.init(rng)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (3, m.NUM_LATENTS))
    z1, iaf_mu, iaf_ls = m.iaf(v, z0)
    assert z1.shape == z0.shape
    np.testing.assert_allclose(
        np.asarray(z1), np.asarray((z0 - iaf_mu) / jnp.exp(iaf_ls)), rtol=1e-5
    )
    # decode_pre_iaf(z0) must equal decode(iaf(z0))
    np.testing.assert_allclose(
        np.asarray(m.decode_pre_iaf(v, z0)), np.asarray(m.decode(v, z1)), rtol=1e-4, atol=1e-5
    )


def test_train_mode_returns_bn_updates(rng):
    m = get_config("IAN_simple")
    v = m.init(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    upd = {}
    m.encode_stats(v, x, train=True, upd=upd)
    assert "bnorm2.mean" in upd and "bnorm2.inv_std" in upd
    assert not np.allclose(np.asarray(upd["bnorm2.mean"]), 0)


@pytest.mark.parametrize("name", ["IAN", "IANv1"])
def test_rgb_beta_head_packed_equals_plain(name, rng):
    """The space-to-depth head (default) is the same linear-map-plus-
    elementwise computation as the direct MDCL form."""
    m = REGISTRY[name]
    v = m.init(rng)
    cin = v["RW"].shape[2]
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, cin)) * 0.3
    plain = m.rgb_beta_head(v, h, mode="plain")
    packed = m.rgb_beta_head(v, h, mode="packed")
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=1e-4, atol=1e-5)


def test_config_lookup():
    assert get_config("IAN_simple.py").cfg["batch_size"] == 128
    assert get_config("/some/path/IAN.py").cfg["max_epochs"] == 80
    with pytest.raises(KeyError):
        get_config("nope")
