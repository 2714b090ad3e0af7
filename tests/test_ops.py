"""Unit tests for norm / sampling / minibatch / beta ops."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.beta import beta_mean
from npe_tpu.ops.minibatch import minibatch_discrimination
from npe_tpu.ops.norm import batch_norm_apply, batch_renorm_apply
from npe_tpu.ops.sampling import gaussian_sample


def test_batch_norm_train_normalizes():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 7)) * 3 + 5
    beta = jnp.zeros(7)
    gamma = jnp.ones(7)
    y, (m, s) = batch_norm_apply(x, beta, gamma, jnp.zeros(7), jnp.ones(7), train=True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, 0)), 1, atol=1e-2)
    # EMA: new = 0.9*old + 0.1*batch
    np.testing.assert_allclose(np.asarray(m), 0.1 * np.asarray(jnp.mean(x, 0)), rtol=1e-4)


def test_batch_norm_eval_uses_running_stats():
    x = jnp.ones((4, 3)) * 2.0
    y, _ = batch_norm_apply(
        x, jnp.zeros(3), jnp.ones(3), jnp.ones(3) * 2.0, jnp.ones(3) * 0.5, train=False
    )
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_batch_norm_spatial_axes():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 5))
    y, (m, s) = batch_norm_apply(
        x, jnp.zeros(5), jnp.ones(5), jnp.zeros(5), jnp.ones(5), train=True
    )
    assert m.shape == (5,)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, (0, 1, 2))), 0, atol=1e-4)


def test_batch_renorm_reduces_to_bn_when_stats_match():
    """With running stats == batch stats, r=1 d=0 and ReNorm == BN."""
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 6))
    mu = jnp.mean(x, 0)
    istd = 1.0 / jnp.sqrt(jnp.var(x, 0) + 1e-4)
    beta, gamma = jnp.zeros(6), jnp.ones(6)
    y_rn, _ = batch_renorm_apply(x, beta, gamma, mu, istd, rmax=3.0, dmax=5.0, train=True)
    y_bn, _ = batch_norm_apply(x, beta, gamma, mu, istd, train=True)
    np.testing.assert_allclose(np.asarray(y_rn), np.asarray(y_bn), atol=1e-5)


def test_gaussian_sample():
    mu = jnp.ones((4, 10))
    ls = jnp.full((4, 10), -10.0)  # tiny sigma
    assert np.allclose(np.asarray(gaussian_sample(mu, ls, None)), 1.0)  # deterministic
    s = gaussian_sample(mu, ls, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-3)
    # sigma=1: samples differ from mu
    s2 = gaussian_sample(mu, jnp.zeros_like(ls), jax.random.PRNGKey(0))
    assert float(jnp.std(s2)) > 0.1


def test_minibatch_discrimination_shape_and_selfmask():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12))
    theta = jax.random.normal(jax.random.PRNGKey(1), (12, 5, 3)) * 0.05
    lws = jnp.zeros((5, 3))
    b = jnp.full(5, -1.0)
    out = minibatch_discrimination(x, theta, lws, b)
    assert out.shape == (8, 12 + 5)
    np.testing.assert_array_equal(np.asarray(out[:, :12]), np.asarray(x))
    # identical samples -> f = (N-1)*exp(0) + b = 7 - 1 = 6 for each kernel
    xx = jnp.tile(x[:1], (8, 1))
    out2 = minibatch_discrimination(xx, theta, lws, b)
    np.testing.assert_allclose(np.asarray(out2[:, 12:]), 6.0, rtol=1e-4)


def test_beta_mean():
    a = jnp.array([1.0, 2.0])
    b = jnp.array([1.0, 0.0])
    out = beta_mean(a, b)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0], atol=1e-6)


def test_renorm_schedule_ramp():
    """Identity clips before the ramp, full clips after, monotone between;
    works both with Python ints and traced values."""
    import jax

    from npe_tpu.ops.norm import renorm_schedule

    r0, d0 = renorm_schedule(0)
    assert float(r0) == 1.0 and float(d0) == 0.0
    r1, d1 = renorm_schedule(3000)
    assert 1.0 < float(r1) < 3.0 and 0.0 < float(d1) < 5.0
    r2, d2 = renorm_schedule(10_000)
    assert float(r2) == 3.0 and float(d2) == 5.0
    rj, dj = jax.jit(renorm_schedule)(jnp.int32(10_000))
    assert float(rj) == 3.0 and float(dj) == 5.0


def test_renorm_schedule_feeds_renorm():
    """Scheduled clips at itr=0 make renorm equal plain BN even when the
    running stats DISAGREE with batch stats (r/d clipped to identity)."""
    from npe_tpu.ops.norm import renorm_schedule

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 6).astype(np.float32) * 2 + 1)
    beta, gamma = jnp.zeros(6), jnp.ones(6)
    mean, istd = jnp.full(6, 5.0), jnp.full(6, 0.25)  # wildly off
    rmax, dmax = renorm_schedule(0)
    y_rn, _ = batch_renorm_apply(x, beta, gamma, mean, istd, rmax, dmax, train=True)
    y_bn, _ = batch_norm_apply(x, beta, gamma, mean, istd, train=True)
    np.testing.assert_allclose(np.asarray(y_rn), np.asarray(y_bn), rtol=1e-5, atol=1e-5)
