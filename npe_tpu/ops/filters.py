"""In-graph image filters.

The reference's edit loop calls `scipy.ndimage.filters.gaussian_filter(...,
0.7)` on the HOST between two GPU round-trips (`NPE.py:224`). Here the blur
is a separable pair of 1-D convolutions inside the jitted edit step, so the
whole stroke -> gradient -> decode -> mask -> composite chain stays on-chip.

Kernel weights and boundary handling match scipy exactly (sampled Gaussian,
truncate=4.0, 'reflect' boundaries) -- verified in tests/test_filters.py.
"""

import math

import jax.numpy as jnp
import numpy as np

from jax import lax


def gaussian_kernel_1d(sigma, truncate=4.0):
    """scipy.ndimage._gaussian_kernel1d: sampled pdf, normalized."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x**2)
    return (phi / phi.sum()).astype(np.float32), radius


def gaussian_blur_2d(img, sigma=0.7, truncate=4.0):
    """Blur a (H, W) image (the editor MASK shape); matches
    scipy.ndimage.gaussian_filter(img, sigma) with mode='reflect'."""
    k, r = gaussian_kernel_1d(sigma, truncate)
    k = jnp.asarray(k)
    # reflect (scipy) == numpy 'symmetric'
    p = jnp.pad(img, ((r, r), (r, r)), mode="symmetric")
    # rows: correlate along axis 0, then axis 1; Gaussian is symmetric so
    # correlation == convolution.
    x = p[None, :, :, None]  # NHWC
    kx = k.reshape(-1, 1, 1, 1)
    ky = k.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn)
    x = lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn)
    return x[0, :, :, 0]
