"""MDCL: the fused single-kernel implementation must equal the reference's
branch-per-scale sum (`layers.py:207-258`)."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.conv import conv2d, dilated_conv2d
from npe_tpu.ops.mdcl import compose_mdcl_kernel, mdcl_apply, mdclw_kernel, subpixel_shuffle


def _branch_reference(x, w, coeff_base, scale_coeffs, scales):
    """Literal translation of the reference block: one conv per branch,
    elementwise-summed."""
    out = conv2d(x, w * coeff_base, stride=1, padding=1)
    for s in scales:
        c = scale_coeffs[s]
        if s == 0:
            w1 = jnp.mean(w, axis=(0, 1), keepdims=True) * c
            out = out + conv2d(x, w1, stride=1, padding=0)
        else:
            out = out + dilated_conv2d(x, w * c, s)
    return out


def test_mdcl_fused_equals_branches():
    # f32: XLA CPU convolutions use reduced-precision fast paths, so allow
    # ~1e-2; the f64 test below pins exactness (~1e-14).
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, 16, 16, 6))
    w = jax.random.normal(ks[1], (3, 3, 6, 4)) * 0.1
    for scales in ([0, 2], [0, 2, 3], [2, 3, 4]):
        coeff_base = jax.random.normal(ks[2], (4,))
        scale_coeffs = {s: jax.random.normal(ks[3 + i % 3], (4,)) for i, s in enumerate(scales)}
        fused = mdcl_apply(x, w, coeff_base, scale_coeffs, scales)
        ref = _branch_reference(x, w, coeff_base, scale_coeffs, scales)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-2, atol=1e-2)


def test_mdcl_fused_exact_in_f64():
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    try:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (2, 16, 16, 6), jnp.float64)
        w = jax.random.normal(ks[1], (3, 3, 6, 4), jnp.float64) * 0.1
        scales = [0, 2, 3]
        coeff_base = jax.random.normal(ks[2], (4,), jnp.float64)
        scale_coeffs = {
            s: jax.random.normal(ks[3 + i % 3], (4,), jnp.float64) for i, s in enumerate(scales)
        }
        fused = mdcl_apply(x, w, coeff_base, scale_coeffs, scales)
        ref = _branch_reference(x, w, coeff_base, scale_coeffs, scales)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-10, atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_mdcl_multi_equals_separate():
    """Fused multi-head MDCL (one conv, concat kernels) == separate blocks."""
    import jax as _jax

    from npe_tpu.models.common import VarBuilder, mdcl, mdcl_multi

    vb = VarBuilder(_jax.random.PRNGKey(0))
    scales = [2, 3, 4]
    for name, cout in (("R", 2), ("G_a", 2), ("B_a", 3)):
        vb.mdcl(name, 6, cout, scales)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    fused = mdcl_multi(vb.v, ["R", "G_a", "B_a"], x, scales)
    for name, out in zip(["R", "G_a", "B_a"], fused):
        ref = mdcl(vb.v, name, x, scales)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-3)


def test_mdclw_overwrite_semantics():
    """mdclW places the base filter ON TOP of larger-scale copies
    (`layers.py:147`: enumerate backwards)."""
    w = jnp.ones((3, 3, 1, 1))
    k = mdclw_kernel(w, {1: jnp.array([2.0]), 2: jnp.array([3.0])}, [2])
    # size = 3 + 2*(2-1) = 5, center tap must hold the base (2.0), corners of
    # the dilated copy (3.0) survive where the base doesn't cover.
    assert k.shape == (5, 5, 1, 1)
    assert k[2, 2, 0, 0] == 2.0  # base overwrites center
    assert k[0, 0, 0, 0] == 3.0  # dilated corner
    assert k[1, 1, 0, 0] == 2.0  # base 3x3 region
    assert k[0, 1, 0, 0] == 0.0  # untouched


def test_subpixel_shuffle():
    """Channel mapping per reference SubpixelLayer (`layers.py:166-171`)."""
    r, c = 2, 3
    x = jnp.arange(1 * 2 * 2 * c * r * r, dtype=jnp.float32).reshape(1, 2, 2, c * r * r)
    y = subpixel_shuffle(x, r)
    assert y.shape == (1, 4, 4, c)
    # out[0, h*r+dx, w*r+dy, ch] == x[0, h, w, ch*r^2 + dx*r + dy]
    for h in range(2):
        for w_ in range(2):
            for dx in range(r):
                for dy in range(r):
                    for ch in range(c):
                        assert y[0, h * r + dx, w_ * r + dy, ch] == x[
                            0, h, w_, ch * r * r + dx * r + dy
                        ]


def test_mdcl_branch_mode_equals_fused():
    """mdcl_apply(mode='branch') (the profile-selectable no-zero-taps path)
    must match mode='fused' and the literal reference branches."""
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, 16, 16, 6))
    w = jax.random.normal(ks[1], (3, 3, 6, 4)) * 0.1
    for scales in ([0, 2], [0, 2, 3], [2, 3, 4]):
        coeff_base = jax.random.normal(ks[2], (4,))
        scale_coeffs = {s: jax.random.normal(ks[3 + i % 3], (4,)) for i, s in enumerate(scales)}
        br = mdcl_apply(x, w, coeff_base, scale_coeffs, scales, mode="branch")
        fused = mdcl_apply(x, w, coeff_base, scale_coeffs, scales, mode="fused")
        ref = _branch_reference(x, w, coeff_base, scale_coeffs, scales)
        np.testing.assert_allclose(np.asarray(br), np.asarray(ref), rtol=2e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(br), np.asarray(fused), rtol=2e-2, atol=1e-2)
