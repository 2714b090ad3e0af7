"""Encoder-FID quality metric (training/quality.py): exact Frechet-distance
algebra plus an end-to-end smoke on a real model."""

import jax
import numpy as np
import pytest

from npe_tpu.training.quality import (
    batched_features,
    encoder_fid,
    feature_stats,
    frechet_distance,
    model_samples,
)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(200, 8)
    mu, cov = feature_stats(f)
    assert frechet_distance(mu, cov, mu, cov) < 1e-6


def test_frechet_diagonal_gaussians_analytic():
    """For diagonal covariances the distance is
    |mu1-mu2|^2 + sum (sqrt(a_i) - sqrt(b_i))^2."""
    mu1 = np.array([0.0, 1.0, -2.0])
    mu2 = np.array([1.0, 1.0, 0.0])
    a = np.array([1.0, 4.0, 0.25])
    b = np.array([9.0, 1.0, 1.0])
    expect = np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(a) - np.sqrt(b)) ** 2)
    got = frechet_distance(mu1, np.diag(a), mu2, np.diag(b), eps=0.0)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_frechet_symmetric_and_shift_sensitive():
    rng = np.random.RandomState(1)
    f1 = rng.randn(300, 6)
    f2 = f1 + 2.0
    s1, s2 = feature_stats(f1), feature_stats(f2)
    d12 = frechet_distance(*s1, *s2)
    d21 = frechet_distance(*s2, *s1)
    np.testing.assert_allclose(d12, d21, rtol=1e-6)
    assert d12 > 10.0  # ~ |shift|^2 * dim = 24


@pytest.mark.slow
def test_encoder_fid_smoke():
    """Untrained IAN_simple: FID(real, samples) is finite and positive, and
    FID between two disjoint halves of the SAME real set is much smaller
    than FID(real, samples)."""
    from npe_tpu.data import get_dataset
    from npe_tpu.models import get_config

    m = get_config("IAN_simple")
    v = m.init(jax.random.PRNGKey(0))
    ds = get_dataset("synthetic", num_examples=64)
    chunks = ds.get_data(np.arange(64))
    real = (2.0 * chunks.astype(np.float32) / 255.0 - 1.0).transpose(0, 2, 3, 1)

    fid = encoder_fid(m, v, real, num=32, batch_size=16)
    assert np.isfinite(fid) and fid > 0

    fa = batched_features(m, v, real[:32], batch_size=16)
    fb = batched_features(m, v, real[32:], batch_size=16)
    d_real_real = frechet_distance(*feature_stats(fa), *feature_stats(fb))
    gen = model_samples(m, v, 32, batch_size=16)
    fg = batched_features(m, v, gen, batch_size=16)
    d_real_gen = frechet_distance(*feature_stats(fa), *feature_stats(fg))
    assert d_real_gen > d_real_real


def test_encoder_fid_frozen_feature_space():
    """With `feature_variables` fixed, the metric is invariant to changes in
    the *sampled* model's encoder (incl. BN state) -- only its decoder output
    matters -- and sensitive to decoder changes."""
    from npe_tpu.data import get_dataset
    from npe_tpu.models import get_config

    m = get_config("IAN_simple")
    ref = m.init(jax.random.PRNGKey(0))
    ds = get_dataset("synthetic", num_examples=32)
    chunks = ds.get_data(np.arange(32))
    real = (2.0 * chunks.astype(np.float32) / 255.0 - 1.0).transpose(0, 2, 3, 1)

    cur = dict(m.init(jax.random.PRNGKey(1)))
    base = encoder_fid(m, cur, real, num=16, batch_size=16, feature_variables=ref)

    # Perturb ONLY the current model's encoder (conv tower + BN stats):
    # decode path untouched -> identical samples -> identical metric.
    enc = {
        k: np.asarray(v) + 0.5
        for k, v in cur.items()
        if k.startswith(("enc_conv", "bnorm2.", "bnorm3.", "bnorm4."))
        and not k.endswith(".weights_mask")
    }
    assert enc
    perturbed = {**cur, **enc}
    same = encoder_fid(m, perturbed, real, num=16, batch_size=16, feature_variables=ref)
    np.testing.assert_allclose(same, base, rtol=1e-6)

    # Perturb the decoder -> samples change -> metric moves.
    dec = {k: np.asarray(v) * 1.5 for k, v in cur.items() if k.startswith("dec_conv")}
    moved = encoder_fid(m, {**cur, **dec}, real, num=16, batch_size=16, feature_variables=ref)
    assert abs(moved - base) > 1e-3
