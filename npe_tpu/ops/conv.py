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

import numpy as np

import jax
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


# Implementation used by deconv2d_phased: "split" issues one conv per output-
# pixel parity (4 convs, zero wasted MACs); "block" merges the 4 phase
# kernels -- zero-padded to a common 3x3 footprint -- into ONE conv with
# 4*Cout channels followed by depth_to_space (1.44x the MACs but a single
# large MXU op); "lhs" is the one lhs-dilated conv of deconv2d. Measured on
# v5e, batch 128 (bench_deconv_ab.py, ms/batch):
#   1024->512 @8 out: split 0.91 | block 1.47 | lhs 1.26
#    512->512 @8 out: split 0.74 | block 0.98 | lhs 0.91
#    512->256 @16:    split 0.85 | block 1.04 | lhs 0.82
#    256->128 @32:    split 0.89 | block 0.98 | lhs 0.85
#    128->128 @64:    split 1.51 | block 1.36 | lhs 1.14
#    128->3   @64:    split 0.94 | block 0.78 | lhs 0.89
# so "auto": split below 16 input spatial (and in the batch<8 latency
# regime, where split also measures fastest end to end), block for lane-
# starved tiny Cout at wide spatial, lhs otherwise. Overridable per process
# with NPE_DECONV_MODE for deployment tuning.
import os as _os

DEFAULT_DECONV_MODE = _os.environ.get("NPE_DECONV_MODE", "auto")


def deconv2d_phased(x, w, b=None, mode=None):
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
    mode = mode or DEFAULT_DECONV_MODE
    if mode == "auto":
        if x.shape[0] < 8:
            # Latency regime (the editor's batch-1 stroke): the 4-phase
            # split form measures fastest end to end (bench_edit.py).
            mode = "split"
        elif x.shape[1] >= 32 and w.shape[3] <= 16:
            mode = "block"
        elif x.shape[1] >= 16:
            mode = "lhs"
        else:
            mode = "split"
    if mode == "lhs":
        return deconv2d(x, w, b=b)
    if mode == "block":
        return _deconv2d_block(x, w, b)
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


def deconv2d_block_packed(x, w):
    """The block-mode deconv WITHOUT the final depth_to_space: returns
    (N, H, W, 4*Cout) where channel (a*2+b)*Cout + c is output pixel
    (2i+a, 2j+b)'s channel c. Callers that immediately re-pack the 2x
    output (e.g. the decoder-tail -> packed RGB-Beta head fusion) consume
    this directly and skip two full HBM passes of the widest activation."""
    kh, kw, cin, cout = w.shape
    t = np.arange(3)[:, None]
    a = np.arange(2)[None, :]
    ih = 4 - 2 * t + a  # (3, 2) tap index per (conv tap, parity)
    valid = ih < kh
    ihc = np.clip(ih, 0, kh - 1)
    kk = w[ihc][:, :, ihc]  # (3, 2, 3, 2, Cin, Cout)
    mask = valid[:, :, None, None] & valid[None, None, :, :]
    kk = kk * jnp.asarray(mask[..., None, None], w.dtype)
    # -> (t_h, t_w, Cin, a, b, Cout): out-pack (a*2+b)*Cout + c, the
    # depth_to_space channel order.
    kk = kk.transpose(0, 2, 4, 1, 3, 5).reshape(3, 3, cin, 4 * cout)
    return conv2d(x, kk, stride=1, padding=1)


def _deconv2d_block(x, w, b=None):
    """Single-conv form of deconv2d_phased: with pad (1,1) the even-parity
    phase kernel per dim is [w4, w2, w0] and the odd one [0, w3, w1]
    (tap index k = 2*(1 - t) + 2 + a for conv tap t and output parity a),
    so all four phases stack into one (3, 3, Cin, 4*Cout) kernel whose
    output depth_to_space(2) interleaves."""
    y = depth_to_space(deconv2d_block_packed(x, w), 2)
    if b is not None:
        y = y + b
    return y


# The encoder's stride-2 5x5 convs (reference `IAN_simple.py:73-116`) get a
# custom VJP: XLA derives their input-gradient as ONE lhs-dilated conv over a
# zero-stuffed cotangent -- at the tower's small spatial sizes that computes
# ~4x the useful MACs (stride-2 zero-stuffing in 2-D). But the input-grad of
# a stride-2 pad-2 5x5 conv IS a deconv with the channel-transposed kernel
# (tests/test_conv.py:test_deconv_equals_grad_of_forward_conv), and the
# backward shapes mirror the decoder's forward shapes exactly (4x4x1024 ->
# 8x8x512, ..., 32x32x128 -> 64x64x3), so the v5e-measured `deconv2d_phased`
# auto policy above applies as-is. Weight/bias grads keep XLA's derivation
# (they fuse with the Adam update in the step's epilogue). Train-step A/B on
# v5e b128 (bench_train.py): see BENCHMARKS.md round-4 section.
ENC_BWD_MODE = _os.environ.get("NPE_ENC_BWD", "phased")


def _conv2d_k5s2p2(x, w):
    return conv2d(x, w, stride=2, padding=2)


def _enc_fwd(x, w):
    return _conv2d_k5s2p2(x, w), (x, w)


def _enc_bwd(res, ct):
    x, w = res
    dx = deconv2d_phased(ct, jnp.transpose(w, (0, 1, 3, 2)))
    _, wvjp = jax.vjp(lambda w_: conv2d(x, w_, stride=2, padding=2), w)
    (dw,) = wvjp(ct)
    return dx, dw


conv2d_enc = jax.custom_vjp(_conv2d_k5s2p2)
conv2d_enc.defvjp(_enc_fwd, _enc_bwd)


def enc_conv2d(x, w, b=None):
    """Stride-2 pad-2 5x5 conv with the phased input-gradient (see above).
    `NPE_ENC_BWD=default` restores XLA's derived gradient for A/B.

    Contract: k=5/s=2/p=2 with EVEN input H/W (every tower size is a power
    of two, 64 down to 8) -- the phased backward reconstructs dx at exactly
    2x the cotangent's spatial size, which is the forward input only when
    H and W are even. The custom_vjp also means no forward-mode AD
    (jvp/jacfwd) through these convs; nothing in-tree uses it."""
    if ENC_BWD_MODE == "phased":
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
            f"enc_conv2d phased backward requires even spatial dims, got "
            f"{x.shape}; use conv2d(..., stride=2, padding=2) or "
            f"NPE_ENC_BWD=default for odd sizes"
        )
        y = conv2d_enc(x, w)
    else:
        y = _conv2d_k5s2p2(x, w)
    if b is not None:
        y = y + b
    return y


def space_to_depth(x, r):
    """NHWC -> (N, H/r, W/r, r*r*C); packed channel index = (p*r + q)*C + c
    for in-block pixel offset (p, q). Inverse of `depth_to_space`."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * c)


def depth_to_space(y, r):
    """(N, H, W, r*r*C) -> (N, H*r, W*r, C), inverse of `space_to_depth`."""
    n, h, w, prc = y.shape
    c = prc // (r * r)
    y = y.reshape(n, h, w, r, r, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c)


def s2d_block_taps(ksize, r):
    """Spatial tap count of the packed (space-to-depth) form of an odd
    `ksize` 'same' conv at block factor r."""
    return 2 * -(-(ksize // 2) // r) + 1


def pack_kernel_s2d(k, r):
    """Repack a dense odd-sized 'same' conv kernel (K, K, Cin, Cout) into the
    equivalent kernel over space-to-depth inputs/outputs:
    (T, T, r*r*Cin, r*r*Cout) with T = s2d_block_taps(K, r).

    Why: convolutions with few output channels starve the MXU -- the output-
    feature dimension pads to the 128-wide lane tile, so e.g. the RGB-Beta
    head's Cout=6 conv runs at ~6/128 of peak. Folding an r x r pixel block
    into channels multiplies both channel dims by r^2 at 1/r^2 the spatial
    positions: identical math (each dense tap maps to exactly one packed tap;
    taps falling outside the dense kernel are zero), full lane utilization.

    conv2d_s2d(x, k, r) == conv2d(x, k, padding=K//2) exactly, for H and W
    divisible by r (tests/test_conv.py)."""
    ksize = k.shape[0]
    half = ksize // 2
    t = s2d_block_taps(ksize, r)
    tc = t // 2
    # Output pixel y = r*i + a reads input row r*(i + u - tc) + p, i.e. dense
    # tap dy = r*(u - tc) + p - a + half; taps outside [0, K) are zeros.
    u = np.arange(t)[:, None, None]
    p = np.arange(r)[None, :, None]
    a = np.arange(r)[None, None, :]
    dy = r * (u - tc) + p - a + half  # (T, r_in, r_out)
    valid = (dy >= 0) & (dy < ksize)
    dyc = np.clip(dy, 0, ksize - 1)
    # kk[u, p, a, v, q, b, ci, co] = k[dy, dx, ci, co] masked
    kk = k[dyc][:, :, :, dyc]  # (T, r, r, T, r, r, Cin, Cout)
    mask = (
        valid[:, :, :, None, None, None]
        & valid[None, None, None, :, :, :]
    )
    kk = kk * jnp.asarray(mask[..., None, None], k.dtype)
    # -> (u, v, p, q, ci, a, b, co): in-pack (p*r+q)*Cin + ci, out-pack
    # (a*r+b)*Cout + co, matching space_to_depth's channel order.
    kk = kk.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    cin, cout = k.shape[2], k.shape[3]
    return kk.reshape(t, t, r * r * cin, r * r * cout)


def conv2d_s2d(x, k, r, b=None):
    """'Same' conv with a dense odd kernel, computed in space-to-depth form
    (see `pack_kernel_s2d`). Equal to conv2d(x, k, padding=K//2) + b."""
    t = s2d_block_taps(k.shape[0], r)
    y = conv2d(space_to_depth(x, r), pack_kernel_s2d(k, r), stride=1, padding=t // 2)
    y = depth_to_space(y, r)
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
