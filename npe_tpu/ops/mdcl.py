"""Multiscale Dilated Convolution (MDC) family, TPU-first.

The reference's `MDCL` block (`layers.py:207-258`) runs one shared 3x3 filter
W through several parallel conv layers -- an undilated 3x3, a 1x1 conv of the
filter means, and one dilated 3x3 per scale (via Theano's backward-pass
dilated conv + layout dimshuffle) -- each scaled by a learned per-output-
channel coefficient, then sums the branch outputs elementwise.

Sum-of-convolutions over a shared input == one convolution with the summed
(sparse, multiscale) kernel. So here the whole block composes ONE kernel of
size (3 + 2*(max_scale-1)) and issues ONE `conv_general_dilated` -- a single
large MXU op instead of 4 kernel launches + 3 elementwise adds. This is the
"efficient MDC reparameterization" the reference itself sketches at
`layers.py:134-150` (`mdclW`), generalized and made the default.

Equivalence with the branch-per-scale formulation is asserted in
tests/test_mdcl.py.
"""

import jax.numpy as jnp

from npe_tpu.ops.conv import conv2d


def mdcl_kernel_size(scales):
    smax = max([s for s in scales if s > 0] + [1])
    return 3 + 2 * (smax - 1)


def compose_mdcl_kernel(w, coeff_base, scale_coeffs, scales):
    """Build the combined multiscale kernel (additive branch semantics).

    w: (3, 3, ni, nf) shared base filter (HWIO).
    coeff_base: (nf,) coefficient of the undilated 3x3 branch.
    scale_coeffs: dict {scale: (nf,)}; scale 0 is the 1x1 mean-filter branch
    (reference `layers.py:238-247`), scale s>=1 the dilation-s branch.
    Returns (size, size, ni, nf).
    """
    size = mdcl_kernel_size(scales)
    c = size // 2
    big = jnp.zeros((size, size) + w.shape[2:], w.dtype)
    # Undilated 3x3 at the center (dilation 1).
    big = big.at[c - 1 : c + 2, c - 1 : c + 2].add(w * coeff_base)
    for s in scales:
        coeff = scale_coeffs[s]
        if s == 0:
            # 1x1 conv of the filter means at the center tap.
            big = big.at[c, c].add(jnp.mean(w, axis=(0, 1)) * coeff)
        else:
            big = big.at[c - s : c + s + 1 : s, c - s : c + s + 1 : s].add(w * coeff)
    return big


# Global default for mdcl_apply's mode (models pass mode=None). "fused"
# composes one dense kernel (one MXU op, but computes every structurally-
# zero tap); "branch" runs one rhs-dilated 3x3 conv per scale (no zero
# taps, more dispatches); "auto" picks per scale set: measured on v5e
# (bench_stages.py), fused wins up to a 5x5 composed kernel (19/25 taps
# nonzero for scales [0,2]) while branch wins at 7x7+ (<=27/49 nonzero for
# [0,2,3], ~1.9x fewer FLOPs and ~15% faster end to end).
# Overridable per process with NPE_MDCL_MODE for deployment tuning.
import os as _os

DEFAULT_MODE = _os.environ.get("NPE_MDCL_MODE", "auto")


def mdcl_apply(x, w, coeff_base, scale_coeffs, scales, mode=None):
    """The whole MDCL block ('same' padding). mode: 'fused' | 'branch' |
    'auto' | None (DEFAULT_MODE). All modes are numerically equivalent
    (test_mdcl.py)."""
    mode = mode or DEFAULT_MODE
    if mode == "auto":
        mode = "branch" if mdcl_kernel_size(scales) >= 7 else "fused"
    if mode == "branch":
        return mdcl_apply_branch(x, w, coeff_base, scale_coeffs, scales)
    k = compose_mdcl_kernel(w, coeff_base, scale_coeffs, scales)
    pad = k.shape[0] // 2
    return conv2d(x, k, stride=1, padding=pad)


def mdcl_apply_branch(x, w, coeff_base, scale_coeffs, scales):
    """Branch-per-scale MDCL: base 3x3 (with the 1x1 mean-filter branch
    folded into its center tap -- both are dilation-1 footprints) + one
    rhs-dilated 3x3 conv per scale, per-output-channel coefficients folded
    into the kernels (reference `layers.py:207-258` branch semantics, minus
    the elemwise-sum layers -- XLA fuses the adds into the conv epilogues)."""
    k3 = w * coeff_base
    for s in scales:
        if s == 0:
            k3 = k3.at[1, 1].add(jnp.mean(w, axis=(0, 1)) * scale_coeffs[0])
    out = conv2d(x, k3, stride=1, padding=1)
    for s in scales:
        if s > 0:
            out = out + conv2d(x, w * scale_coeffs[s], stride=1, padding=s, rhs_dilation=s)
    return out


def mdclw_kernel(w, coeffs, scales):
    """`mdclW` (`layers.py:138-150`): OVERWRITE placement (set_subtensor),
    largest scale first so the base filter lands on top. Library extra; the
    shipped models use the additive `MDCL` block above.

    coeffs: dict {scale: (nf,)}; scale 1 = the base (undilated) filter.
    """
    size = mdcl_kernel_size(scales)
    c = size // 2
    big = jnp.zeros((size, size) + w.shape[2:], w.dtype)
    for s in sorted([s for s in scales if s > 0] + [1], reverse=True):
        coeff = coeffs[s]
        big = big.at[c - s : c + s + 1 : s, c - s : c + s + 1 : s].set(w * coeff)
    return big


def subpixel_shuffle(x, r):
    """ESPCN subpixel (pixel-shuffle) upscaling, reference `SubpixelLayer`
    (`layers.py:157-171`) channel mapping: out[.., hr+dx, wr+dy, c] =
    x[.., h, w, c*r^2 + r*dx + dy]. NHWC; C must be divisible by r^2.

    The reference notes its reshape variant (`SubpixelLayer2`) was 10x slower
    on GPU; on TPU a reshape/transpose compiles to an efficient layout op, so
    a single implementation covers both.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, dx, W, dy, C
    return x.reshape(n, h * r, w * r, c)
