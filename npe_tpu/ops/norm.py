"""Batch normalization with explicit running-statistics state.

The reference uses Lasagne's `batch_norm` wrapper (e.g. `IAN_simple.py:84-94`)
which (a) drops the wrapped layer's bias, (b) normalizes the *pre-activation*
output, (c) applies the nonlinearity afterwards, and keeps running `mean` and
`inv_std` buffers updated by Theano `default_update` side effects
(`layers.py:111-128`). Here state is explicit: apply functions return the
updated running stats and the training step threads them functionally.

Conventions kept for checkpoint parity: Lasagne stores `inv_std` (not var),
epsilon=1e-4, alpha=0.1 exponential moving average.

`batch_renorm_apply` implements Batch ReNormalization (arXiv 1702.03275),
reference `BatchReNormDNNLayer` (`layers.py:48-130`): the r/d corrections are
computed from running stats with RMAX/DMAX clips managed by the caller, and
gradients do NOT flow through r and d (they are corrections, per the paper).
"""

import jax
import jax.numpy as jnp

EPS = 1e-4
ALPHA = 0.1


def _reduce_axes(x):
    # Normalize over all but the channel axis (last in NHWC / NC).
    return tuple(range(x.ndim - 1))


def batch_norm_apply(x, beta, gamma, mean, inv_std, train):
    """Returns (y, (new_mean, new_inv_std)).

    train=True: normalize with batch statistics, EMA-update running stats.
    train=False: normalize with running stats, pass stats through unchanged.
    """
    if train:
        axes = _reduce_axes(x)
        # Mixed precision: when activations are lower-precision than the
        # running stats (bf16 forward, f32 state), batch statistics and the
        # normalization itself run in the stats dtype -- the variance
        # reduction is the one BN op that loses real accuracy in bf16. The
        # casts are elementwise and fuse into the surrounding ops; the
        # output returns in the activation dtype. Dtype-uniform calls
        # (all-f32 training, all-bf16 inference) are unchanged.
        xs = x.astype(mean.dtype) if x.dtype != mean.dtype else x
        mu = jnp.mean(xs, axis=axes)
        var = jnp.var(xs, axis=axes)
        istd = jax.lax.rsqrt(var + EPS)
        y = ((xs - mu) * (gamma.astype(mu.dtype) * istd) + beta.astype(mu.dtype)).astype(x.dtype)
        new_mean = (1 - ALPHA) * mean + ALPHA * mu
        new_inv_std = (1 - ALPHA) * inv_std + ALPHA * istd
        return y, (new_mean, new_inv_std)
    y = (x - mean) * (gamma * inv_std) + beta
    return y, (mean, inv_std)


def batch_renorm_apply(x, beta, gamma, mean, inv_std, rmax, dmax, train):
    """Batch ReNormalization (reference `layers.py:48-130`).

    Returns (y, (new_mean, new_inv_std)). rmax/dmax are annealing clip
    scalars managed by the training loop, exactly as the reference requires
    its caller to manage RMAX/DMAX.
    """
    if not train:
        y = (x - mean) * (gamma * inv_std) + beta
        return y, (mean, inv_std)
    axes = _reduce_axes(x)
    mu = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    istd = jax.lax.rsqrt(var + EPS)
    # r/d corrections use running stats; no gradient flows through them.
    r = jax.lax.stop_gradient(jnp.clip(inv_std / istd, 1.0 / rmax, rmax))
    d = jax.lax.stop_gradient(jnp.clip((mu - mean) * inv_std, -dmax, dmax))
    xhat = (x - mu) * istd * r + d
    y = gamma * xhat + beta
    new_mean = (1 - ALPHA) * mean + ALPHA * mu
    new_inv_std = (1 - ALPHA) * inv_std + ALPHA * istd
    return y, (new_mean, new_inv_std)


def renorm_schedule(itr, rmax_max=3.0, dmax_max=5.0, ramp_start=1000, ramp_end=5000):
    """RMAX/DMAX annealing for batch_renorm_apply: identity-clips (r=1, d=0)
    until `ramp_start` iterations, then a linear ramp to (rmax_max, dmax_max)
    by `ramp_end` -- the protocol of arXiv 1702.03275 section 3, with the
    reference's faster-ramp advice (`layers.py:38-45`: "you may need to
    increase RMAX between 1k and 5k iterations rather than 5k and 25k")
    as the default window. `itr` may be a traced integer (use inside jit) or
    a Python int (use from the epoch loop); returns (rmax, dmax) scalars.

    Config wiring: a model config may set
        cfg["batch_renorm"] = {"rmax_max": 3.0, "dmax_max": 5.0,
                               "ramp_start": 1000, "ramp_end": 5000}
    and pass the scheduled values to batch_renorm_apply each step.
    """
    frac = jnp.clip((itr - ramp_start) / max(1, ramp_end - ramp_start), 0.0, 1.0)
    rmax = 1.0 + frac * (rmax_max - 1.0)
    dmax = frac * dmax_max
    return rmax, dmax
