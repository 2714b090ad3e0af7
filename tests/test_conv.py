"""Geometry/golden tests for the conv family.

The critical one: `deconv2d` must equal the *gradient of the forward conv* --
that is literally what the reference's DeconvLayer computes by emitting
cuDNN's GpuDnnConvGradI (`layers.py:467-483`), with output spatial hardcoded
to stride x input (`layers.py:460`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_tpu.ops.conv import avg_pool, conv2d, deconv2d, dilated_conv2d, global_avg_pool, upscale2d


def test_conv2d_shape_and_values():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3) / 100
    w = jnp.ones((5, 5, 3, 7)) * 0.01
    y = conv2d(x, w, stride=2, padding=2)
    assert y.shape == (2, 4, 4, 7)


@pytest.mark.parametrize("hw,cin,cout", [(4, 6, 5), (8, 3, 2)])
def test_deconv_equals_grad_of_forward_conv(hw, cin, cout):
    """deconv2d(g, W) == d/d(input) [ sum(conv_fwd(input) * g) ] where
    conv_fwd is the 5x5 stride-2 pad-2 conv from (2*hw) -> hw. Exactly the
    cuDNN GradI semantics the reference deconv emits."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # deconv: input (2, hw, hw, cout) -> output (2, 2hw, 2hw, cin); stored
    # kernel (kh, kw, Cin_deconv=cout, Cout_deconv=cin). The corresponding
    # forward conv maps cin-channel images to cout-channel features with
    # HWIO kernel (5, 5, cin, cout) = transpose(w, (0, 1, 3, 2)).
    g = jax.random.normal(k1, (2, hw, hw, cout))
    w = jax.random.normal(k2, (5, 5, cout, cin))

    def fwd(inp):
        return conv2d(inp, jnp.transpose(w, (0, 1, 3, 2)), stride=2, padding=2)

    inp0 = jnp.zeros((2, 2 * hw, 2 * hw, cin))
    _, vjp = jax.vjp(fwd, inp0)
    (grad_inp,) = vjp(g)

    y = deconv2d(g, w, stride=2, crop=2)
    assert y.shape == (2, 2 * hw, 2 * hw, cin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(grad_inp), rtol=1e-4, atol=1e-5)


def test_deconv_matches_lasagne_nondnn_path():
    """The reference's non-cuDNN fallback (`IAN_simple.py:182-223`) is a
    TransposedConv2D with crop=1 followed by slicing off the first row/col.
    Verify deconv2d reproduces it (same weights)."""
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, 4, 4, 3))
    w = jax.random.normal(k2, (5, 5, 3, 2))

    # TransposedConv2D(stride 2, crop 1): output = 2*(i-1) + 5 - 2*1 = 2i+1,
    # then slice [1:] on both spatial dims -> 2i.
    y_tc = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, (0, 1)),
        window_strides=(1, 1),
        padding=((3, 3), (3, 3)),  # k-1-crop = 3 each side
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, 1:, 1:, :]
    y = deconv2d(x, w, stride=2, crop=2)
    assert y_tc.shape == y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_tc), rtol=1e-4, atol=1e-5)


def test_deconv_phased_equals_deconv():
    """Phase-decomposed deconv (4 dense convs + pixel shuffle) must equal
    the lhs-dilated formulation."""
    from npe_tpu.ops.conv import deconv2d_phased

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 6))
    w = jax.random.normal(jax.random.PRNGKey(4), (5, 5, 6, 3))
    b = jax.random.normal(jax.random.PRNGKey(5), (3,))
    a = deconv2d(x, w, b=b)
    for mode in ("split", "block"):
        p = deconv2d_phased(x, w, b=b, mode=mode)
        np.testing.assert_allclose(np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ksize,r,cin,cout,hw", [(9, 4, 5, 6, 16), (7, 2, 3, 2, 8), (3, 4, 2, 2, 8)])
def test_conv2d_s2d_equals_dense(ksize, r, cin, cout, hw):
    """Space-to-depth packed conv (full MXU lanes for tiny-Cout kernels)
    must equal the dense 'same' conv exactly: every dense tap maps to one
    packed tap, out-of-kernel taps are zeros."""
    from npe_tpu.ops.conv import conv2d_s2d

    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(keys[0], (2, hw, hw, cin))
    k = jax.random.normal(keys[1], (ksize, ksize, cin, cout))
    b = jax.random.normal(keys[2], (cout,))
    dense = conv2d(x, k, stride=1, padding=ksize // 2, b=b)
    packed = conv2d_s2d(x, k, r, b=b)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_s2d_roundtrip():
    from npe_tpu.ops.conv import depth_to_space, space_to_depth

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x)
    )


def test_dilated_conv_same_spatial():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 4))
    for d in (1, 2, 3, 4):
        y = dilated_conv2d(x, w, d)
        assert y.shape == x.shape


def test_pooling():
    x = jnp.ones((2, 8, 8, 3))
    assert avg_pool(x, 2, 2).shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(avg_pool(x, 2, 2)), 1.0)
    assert global_avg_pool(x).shape == (2, 3)
    assert upscale2d(x, 2).shape == (2, 16, 16, 3)


def test_enc_conv2d_custom_vjp_matches_default():
    """enc_conv2d's phased input-grad and delegated weight-grad must equal
    XLA's derived gradients of the plain stride-2 pad-2 conv (the custom VJP
    only restructures the computation; see ops/conv.py ENC_BWD commentary)."""
    from npe_tpu.ops.conv import enc_conv2d

    key = jax.random.PRNGKey(3)
    kx, kw, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 16, 16, 6))
    w = jax.random.normal(kw, (5, 5, 6, 10)) * 0.1
    ct = jax.random.normal(kc, (2, 8, 8, 10))

    def ref(x_, w_):
        return conv2d(x_, w_, stride=2, padding=2)

    y_ref, vjp_ref = jax.vjp(ref, x, w)
    y_new, vjp_new = jax.vjp(lambda x_, w_: enc_conv2d(x_, w_), x, w)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    dx_ref, dw_ref = vjp_ref(ct)
    dx_new, dw_new = vjp_new(ct)
    np.testing.assert_allclose(np.asarray(dx_new), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_new), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)


def test_enc_conv2d_custom_vjp_bf16():
    """Mixed-precision training feeds the custom VJP bf16 primals and
    cotangents (cfg['compute_dtype']='bfloat16'); the phased backward must
    stay dtype-stable (bf16 in -> bf16 grads out) and agree with XLA's
    derived gradient at bf16 resolution."""
    from npe_tpu.ops.conv import enc_conv2d

    key = jax.random.PRNGKey(7)
    kx, kw, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 16, 16, 6)).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (5, 5, 6, 10)) * 0.1).astype(jnp.bfloat16)
    ct = jax.random.normal(kc, (2, 8, 8, 10)).astype(jnp.bfloat16)

    y_ref, vjp_ref = jax.vjp(lambda x_, w_: conv2d(x_, w_, stride=2, padding=2), x, w)
    y_new, vjp_new = jax.vjp(lambda x_, w_: enc_conv2d(x_, w_), x, w)
    assert y_new.dtype == jnp.bfloat16
    dx_ref, dw_ref = vjp_ref(ct)
    dx_new, dw_new = vjp_new(ct)
    assert dx_new.dtype == jnp.bfloat16 and dw_new.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(dx_new, np.float32), np.asarray(dx_ref, np.float32), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(dw_new, np.float32), np.asarray(dw_ref, np.float32), rtol=0.05, atol=0.25
    )
