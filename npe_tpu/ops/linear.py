"""Dense layer.

Matches Lasagne DenseLayer semantics (reference `IAN_simple.py:117-126`):
inputs with >2 dims are flattened to (N, -1) first. Weight shape is
(num_inputs, num_units), same as the reference checkpoint layout.

NOTE on flattening order: the reference flattens NCHW as C-order (C, H, W).
We carry NHWC activations, so `dense` flattens (H, W, C). The checkpoint
converter permutes dense-weight input rows accordingly for weights that
consume conv feature maps.
"""

import jax.numpy as jnp


def dense(x, w, b=None):
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    y = jnp.dot(x, w)
    if b is not None:
        y = y + b
    return y
