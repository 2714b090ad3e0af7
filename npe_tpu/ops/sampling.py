"""VAE reparameterization sampling.

Reference `GaussianSampleLayer` (`layers.py:419-433`): z = mu + exp(logsigma)
* eps with GPU MRG RNG, returning mu when deterministic. Here the RNG is an
explicit jax.random key -- counter-based, reproducible, splittable.
`gaussian_sample_spatial` covers the shape-preserving `GSL` variant
(`layers.py:615-628`).
"""

import jax
import jax.numpy as jnp


def gaussian_sample(mu, logsigma, rng=None):
    """rng=None reproduces deterministic=True (returns mu)."""
    if rng is None:
        return mu
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + jnp.exp(logsigma) * eps


# GSL (`layers.py:615-628`) is shape-generic already; alias for inventory.
gaussian_sample_spatial = gaussian_sample


def gaussian_sample_list(mus, logsigmas, rng=None):
    """`GL` (`layers.py:631-632`): list of sampled latent tensors."""
    import jax

    if rng is None:
        return [gaussian_sample(m, ls, None) for m, ls in zip(mus, logsigmas)]
    keys = jax.random.split(rng, len(mus))
    return [gaussian_sample(m, ls, k) for m, ls, k in zip(mus, logsigmas, keys)]
