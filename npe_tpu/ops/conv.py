"""Convolution family, TPU-native.

Everything lowers to `jax.lax.conv_general_dilated`, the op XLA:TPU maps onto
the MXU. Activations are NHWC, kernels HWIO -- the TPU-preferred layouts (the
reference is NCHW/OIHW Theano; the checkpoint converter transposes).

Reference native surface replaced here (SURVEY.md section 2.9):
  * cuDNN forward conv (`Conv2DDNNLayer`, reference `IAN_simple.py:73-116`)
      -> `conv2d`
  * cuDNN conv-input-gradient as deconv (`GpuDnnConvGradI`, reference
    `layers.py:467-483`, output hardcoded to stride x input spatial at
    `layers.py:460`) -> `deconv2d` via lhs-dilation; geometry proven
    equivalent to the gradient of `conv2d` in tests/test_conv.py.
  * backward-pass `DilatedConv2DLayer` (reference `layers.py:248-257`)
      -> `dilated_conv2d` via rhs_dilation, native on TPU.
"""

import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, stride=1, padding="SAME", rhs_dilation=1, b=None):
    """Cross-correlation (cuDNN flip_filters=False semantics).

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout); padding: 'SAME'/'VALID'/int/
    ((lo,hi),(lo,hi)).
    """
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    rhs_dilation = (
        (rhs_dilation, rhs_dilation) if isinstance(rhs_dilation, int) else tuple(rhs_dilation)
    )
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=rhs_dilation,
        dimension_numbers=DN,
    )
    if b is not None:
        y = y + b
    return y


def deconv2d(x, w, stride=2, crop=2, b=None):
    """DCGAN-style transposed conv with the reference DeconvLayer's geometry:
    output spatial = stride * input spatial (reference `layers.py:454-483`).

    The reference emits the raw cuDNN conv-input-gradient op; the TPU-native
    equivalent is an lhs-dilated convolution with the spatially-flipped
    kernel and asymmetric padding (k-1-crop, stride-1+crop).

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout) holding the *forward* filter
    taps unflipped (converter maps reference (Cin, Cout, kh, kw) via
    transpose(2,3,0,1)).
    """
    kh, kw = w.shape[0], w.shape[1]
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    c = (crop, crop) if isinstance(crop, int) else tuple(crop)
    pad = tuple((k - 1 - p, st - 1 + p) for k, st, p in zip((kh, kw), s, c))
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=DN,
    )
    if b is not None:
        y = y + b
    return y


def deconv2d_phased(x, w, b=None):
    """`deconv2d` for the models' fixed geometry (k=5, stride=2, crop=2,
    out=2x) decomposed into 4 phase convolutions + interleave: output pixels
    at parity (ph, pw) depend only on kernel taps of matching parity, so
    instead of one lhs-dilated conv over a zero-stuffed input we run four
    dense convs (3x3/3x2/2x3/2x2) and pixel-shuffle the results. No wasted
    MACs regardless of how the compiler handles lhs dilation.

    Derivation (per dim, p = output index, j = input index, k = tap):
    p = 2j - 2 + k  =>  even p: taps {0,2,4} as a 3-tap correlation with
    kernel flip(w[0::2]) pad (1,1); odd p: taps {1,3} as a 2-tap correlation
    with kernel flip(w[1::2]) pad (0,1). Equality with deconv2d is asserted
    in tests/test_conv.py.
    """
    n, h, ww, cin = x.shape
    cout = w.shape[3]
    phases = []
    for ph in (0, 1):
        row = []
        for pw in (0, 1):
            k = jnp.flip(w[ph::2, pw::2], axis=(0, 1))
            pad_h = (1, 1) if ph == 0 else (0, 1)
            pad_w = (1, 1) if pw == 0 else (0, 1)
            row.append(conv2d(x, k, stride=1, padding=(pad_h, pad_w)))
        phases.append(row)
    # interleave: out[:, 2i+ph, 2j+pw, :] = phases[ph][pw][:, i, j, :]
    top = jnp.stack([phases[0][0], phases[0][1]], axis=3)  # (N,H,W,2,C)
    bot = jnp.stack([phases[1][0], phases[1][1]], axis=3)
    y = jnp.stack([top, bot], axis=2)  # (N,H,2,W,2,C)
    y = y.reshape(n, 2 * h, 2 * ww, cout)
    if b is not None:
        y = y + b
    return y


def dilated_conv2d(x, w, dilation, padding=None):
    """Dilated conv; default padding keeps spatial size ('same' for odd k)."""
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        eff = (kh + (kh - 1) * (d[0] - 1), kw + (kw - 1) * (d[1] - 1))
        padding = tuple(((e - 1) // 2, e // 2) for e in eff)
    return conv2d(x, w, stride=1, padding=padding, rhs_dilation=d)


def avg_pool(x, window, stride, padding="VALID", count_include_pad=False):
    """Average pooling over NHWC spatial dims."""
    window = (window, window) if isinstance(window, int) else tuple(window)
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    if isinstance(padding, str):
        pads = padding
    else:
        pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if count_include_pad or pads == "VALID":
        return summed / (window[0] * window[1])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / counts


def max_pool(x, window, stride, padding="VALID"):
    """Max pooling over NHWC spatial dims (reference Pool2DDNNLayer
    mode='max', used by inception-style blocks)."""
    window = (window, window) if isinstance(window, int) else tuple(window)
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    pads = padding if isinstance(padding, str) else ((0, 0),) + tuple(padding) + ((0, 0),)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1,) + window + (1,), (1,) + stride + (1,), pads
    )


def global_avg_pool(x):
    """GlobalPoolLayer equivalent (reference `IAN_simple.py:225`): NHWC->NC."""
    return jnp.mean(x, axis=(1, 2))


def upscale2d(x, factor):
    """Nearest-neighbor upscale (Lasagne Upscale2DLayer)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
