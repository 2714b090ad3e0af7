"""Nonlinearities used by the reference configs (Lasagne names kept)."""

import jax
import jax.numpy as jnp


def lrelu(alpha=0.2):
    """LeakyRectify(alpha) -- reference encoder/decoder nonlinearity."""

    def f(x):
        return jnp.where(x >= 0, x, alpha * x)

    return f


def relu(x):
    return jnp.maximum(x, 0)


def elu(x):
    return jax.nn.elu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def softmax(x):
    return jax.nn.softmax(x, axis=-1)
