"""Weight initializers matching the reference's Lasagne inits.

Reference usage: `lasagne.init.Normal(0.02)` (`IAN.py:13`, every conv/dense),
`lasagne.init.Orthogonal('relu')` (MADE layers, `layers.py:771`),
`lasagne.init.GlorotUniform` (MaskedLayer default, `layers.py:655`),
`lasagne.init.Constant` (coefficients, biases).

All initializers are pure functions of a PRNG key -> jnp array, the JAX way;
the reference sampled from a global numpy RNG.
"""

import math

import jax
import jax.numpy as jnp


def normal(std=0.01, mean=0.0):
    """Lasagne Normal(std): N(mean, std^2). NOTE: Lasagne's arg is the std."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def constant(val=0.0):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)

    return init


def glorot_uniform(gain=1.0):
    """Lasagne GlorotUniform: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out)).

    For >2D shapes Lasagne computes fan as (shape[0], prod(shape[1:])) after
    treating dim0 as inputs -- we match its DenseLayer usage (2D only needed).
    """

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:
            fan_in, fan_out = shape
        else:
            receptive = math.prod(shape[2:])
            fan_in, fan_out = shape[1] * receptive, shape[0] * receptive
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def orthogonal(gain=1.0):
    """Lasagne Orthogonal(gain); gain='relu' means sqrt(2)."""
    if gain == "relu":
        gain = math.sqrt(2.0)

    def init(key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            raise ValueError("orthogonal init needs >=2 dims")
        flat = (shape[0], math.prod(shape[1:]))
        a = jax.random.normal(key, flat, jnp.float32)
        u, _, vt = jnp.linalg.svd(a, full_matrices=False)
        q = u if u.shape == flat else vt
        return (gain * q.reshape(shape)).astype(dtype)

    return init
