"""Pallas TPU kernels for the editor's per-stroke hot path.

The tail of every paint event -- DELTA = decode - RECON, MASK =
gaussian_blur(min(mean|DELTA|, 1)), IM = RECON + MASK*DELTA +
(1-MASK)*ERROR (reference `NPE.py:218-231`) -- is fused into ONE kernel
that keeps all three 64x64x3 images resident in VMEM.

TPU trick: the separable Gaussian blur becomes two small matmuls on the MXU.
For an HxW mask, blur = B_h @ m @ B_w^T where B is a banded matrix holding
the 1-D Gaussian taps with scipy's 'reflect' boundary folded into the first/
last rows. Precomputed once host-side; exact match to
scipy.ndimage.gaussian_filter (tests/test_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.filters import gaussian_kernel_1d


@functools.lru_cache(maxsize=8)
def _blur_matrix_np(n, sigma, truncate):
    k, r = gaussian_kernel_1d(sigma, truncate)
    b = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in range(-r, r + 1):
            j = i + t
            # scipy 'reflect' boundary: (d c b a | a b c d | d c b a)
            while j < 0 or j >= n:
                if j < 0:
                    j = -j - 1
                if j >= n:
                    j = 2 * n - j - 1
            b[i, j] += k[t + r]
    return b


def blur_matrix(n, sigma=0.7, truncate=4.0):
    """(n, n) operator: (blur_matrix @ v) == scipy 1-D gaussian_filter(v)
    with mode='reflect'. Cached as numpy (NOT a jax array: converting inside
    a jit trace would cache a tracer)."""
    return jnp.asarray(_blur_matrix_np(n, sigma, truncate))


def edit_tail_reference(xh, recon, error, bm, user_mask=None):
    """Pure-jnp formulation (also what the kernel computes). Images are
    (H, W, 3); bm is blur_matrix(H); user_mask an optional (H, W) additive
    mask floor (the reference's sketched-but-unimplemented USER_MASK,
    `NPE.py:58,221`): mask = clip(blur + user_mask, 0, 1)."""
    delta = xh - recon
    m = jnp.minimum(jnp.mean(jnp.abs(delta), axis=-1), 1.0)
    mask = bm @ m @ bm.T
    if user_mask is not None:
        mask = jnp.clip(mask + user_mask, 0.0, 1.0)
    return recon + mask[:, :, None] * delta + (1.0 - mask[:, :, None]) * error


def _kernel(xh_ref, recon_ref, err_ref, bm_ref, um_ref, out_ref):
    xh = xh_ref[:]
    recon = recon_ref[:]
    delta = xh - recon
    m = jnp.minimum(jnp.mean(jnp.abs(delta), axis=0), 1.0)  # (H, W); CHW in
    bm = bm_ref[:]
    blurred = jnp.dot(
        jnp.dot(bm, m, preferred_element_type=jnp.float32),
        bm.T,
        preferred_element_type=jnp.float32,
    )
    mask = jnp.clip(blurred + um_ref[:], 0.0, 1.0)
    out_ref[:] = recon + mask[None] * delta + (1.0 - mask[None]) * err_ref[:]


def edit_tail(xh, recon, error, user_mask=None, sigma=0.7, interpret=False):
    """Fused DELTA/MASK/composite. Inputs (H, W, 3) float32; one VMEM-resident
    kernel, blur on the MXU. user_mask: optional (H, W) additive mask floor
    (None = zeros = pure auto mask). Set interpret=True on CPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = xh.shape[0]
    bm = blur_matrix(h, sigma)
    if user_mask is None:
        user_mask = jnp.zeros((h, xh.shape[1]), xh.dtype)
    # CHW layout inside the kernel: (3, H, W) keeps the lane dim at W=64.
    xh_c = jnp.transpose(xh, (2, 0, 1))
    recon_c = jnp.transpose(recon, (2, 0, 1))
    err_c = jnp.transpose(error, (2, 0, 1))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(xh_c.shape, xh_c.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xh_c, recon_c, err_c, bm, user_mask)
    return jnp.transpose(out, (1, 2, 0))
