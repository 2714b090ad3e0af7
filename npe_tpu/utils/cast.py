"""Dtype casting helpers for bf16 inference/serving paths."""

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating leaf of a pytree to `dtype` (ints/bools/masks
    untouched)."""

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
