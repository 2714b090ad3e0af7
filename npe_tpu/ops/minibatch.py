"""Minibatch discrimination (OpenAI improved-GAN), reference `layers.py:486-524`.

Output features f_i[k] = sum_j exp(-||a_i[k] - a_j[k]||_1) + b[k], appended to
the (flattened) input features. The self term is masked with a 1e6 offset
exactly as the reference does (contributing exp(-1e6) ~= 0).

The O(N^2 * K * D) cross-sample distance is a batched elementwise reduce --
VPU work. N is the batch (16..128), K=500, D=5: ~0.3 GFLOP at N=128, cheap.
"""

import jax.numpy as jnp


def minibatch_discrimination(x, theta, log_weight_scale, b):
    """x: (N, F) [or flattened]; theta: (F, K, D); log_weight_scale: (K, D);
    b: (K,). Returns (N, F + K)."""
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    # Normalize kernels: W = theta * exp(lws) / ||theta||_2 over inputs.
    w = theta * (jnp.exp(log_weight_scale) / jnp.sqrt(jnp.sum(theta**2, axis=0)))[None]
    act = jnp.tensordot(x, w, axes=[[1], [0]])  # (N, K, D)
    # L1 distance across samples: (N, K, N)
    abs_dif = jnp.sum(jnp.abs(act[:, :, :, None] - jnp.transpose(act, (1, 2, 0))[None]), axis=2)
    n = x.shape[0]
    abs_dif = abs_dif + 1e6 * jnp.eye(n, dtype=x.dtype)[:, None, :]
    f = jnp.sum(jnp.exp(-abs_dif), axis=2) + b
    return jnp.concatenate([x, f], axis=1)
