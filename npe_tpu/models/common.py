"""Shared model-building blocks for the IAN family.

All three reference configs share the same encoder tower: four stride-2 5x5
convs 128/256/512/1024 with LeakyReLU(0.2), batch norm from conv2 on, a
1000-unit FC, and 100-dim batchnormed mu / logsigma heads (reference
`IAN_simple.py:73-126`, `IAN.py:71-125`, `IANv1.py` same). The discriminator
IS the encoder: GlobalPool(conv4) -> MinibatchLayer(500) -> Dense
(`IAN_simple.py:225-231`), so encoder features serve VAE inference,
adversarial discrimination and the introspective feature-matching loss.

Parameter naming mirrors the reference checkpoints (Lasagne layer names) so
`utils/convert.py` can port Theano .npz weights 1:1. Non-trainable state
(BN running stats, MADE masks) lives in the same flat dict, distinguished by
name suffix -- exactly the reference's convention (`train_IAN.py:419-422`).

Variables dicts are pytrees; every apply function is pure and returns
(output, updates) where updates holds new BN running stats in train mode.
"""

import os as _os

import jax
import jax.numpy as jnp

from npe_tpu.ops.activations import elu, lrelu, relu
from npe_tpu.ops.conv import conv2d, deconv2d, enc_conv2d, global_avg_pool
from npe_tpu.ops.initializers import normal
from npe_tpu.ops.linear import dense
from npe_tpu.ops.minibatch import minibatch_discrimination
from npe_tpu.ops.norm import batch_norm_apply

NON_TRAINABLE_SUFFIXES = (".mean", ".inv_std", ".weights_mask")


def is_trainable(name):
    return not name.endswith(NON_TRAINABLE_SUFFIXES)


def split_trainable(variables):
    params = {k: v for k, v in variables.items() if is_trainable(k)}
    state = {k: v for k, v in variables.items() if not is_trainable(k)}
    return params, state


class VarBuilder:
    """Init-time helper: owns a PRNG key chain and the flat variables dict."""

    def __init__(self, key):
        self._key = key
        self.v = {}

    def key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def conv(self, name, cin, cout, ksize=5, std=0.02, bias=True):
        self.v[f"{name}.W"] = normal(std)(self.key(), (ksize, ksize, cin, cout))
        if bias:
            self.v[f"{name}.b"] = jnp.zeros(cout)

    def deconv(self, name, cin, cout, ksize=5, std=0.02, bias=True):
        # Stored (kh, kw, cin, cout); reference layout (cin, cout, kh, kw).
        self.v[f"{name}.W"] = normal(std)(self.key(), (ksize, ksize, cin, cout))
        if bias:
            self.v[f"{name}.b"] = jnp.zeros(cout)

    def dense(self, name, nin, nout, std=0.02, bias=True):
        self.v[f"{name}.W"] = normal(std)(self.key(), (nin, nout))
        if bias:
            self.v[f"{name}.b"] = jnp.zeros(nout)

    def bn(self, name, c):
        self.v[f"{name}.beta"] = jnp.zeros(c)
        self.v[f"{name}.gamma"] = jnp.ones(c)
        self.v[f"{name}.mean"] = jnp.zeros(c)
        self.v[f"{name}.inv_std"] = jnp.ones(c)

    def mdcl(self, name, cin, cout, scales, std=0.02):
        # Reference `layers.py:207-258`: shared 3x3 W + per-branch coeffs
        # initialized to 1/(1+len(scales)).
        c0 = 1.0 / (1 + len(scales))
        self.v[f"{name}W"] = normal(std)(self.key(), (3, 3, cin, cout))
        self.v[f"{name}_coeff_base"] = jnp.full(cout, c0)
        for s in scales:
            suffix = "1x1" if s == 0 else str(s)
            self.v[f"{name}_coeff_{suffix}"] = jnp.full(cout, c0)

    def minibatch(self, name, nin, num_kernels=500, dim_per_kernel=5):
        self.v[f"{name}.theta"] = normal(0.05)(self.key(), (nin, num_kernels, dim_per_kernel))
        self.v[f"{name}.log_weight_scale"] = jnp.zeros((num_kernels, dim_per_kernel))
        self.v[f"{name}.b"] = jnp.full(num_kernels, -1.0)


def bn(v, upd, name, x, train):
    y, (m, s) = batch_norm_apply(
        x, v[f"{name}.beta"], v[f"{name}.gamma"], v[f"{name}.mean"], v[f"{name}.inv_std"], train
    )
    if train and upd is not None:
        upd[f"{name}.mean"] = m
        upd[f"{name}.inv_std"] = s
    return y


def mdcl(v, name, x, scales):
    from npe_tpu.ops.mdcl import mdcl_apply

    coeffs = {}
    for s in scales:
        suffix = "1x1" if s == 0 else str(s)
        coeffs[s] = v[f"{name}_coeff_{suffix}"]
    return mdcl_apply(x, v[f"{name}W"], v[f"{name}_coeff_base"], coeffs, scales)


def mdcl_multi(v, names, x, scales):
    """Several MDCL blocks over the SAME input fused into ONE conv: their
    composed multiscale kernels concatenate along the output-channel axis
    (used by the RGB-Beta head where R/G_a/B_a all read the decoder trunk,
    reference `IAN.py:183-206`). Returns one output per name."""
    from npe_tpu.ops.conv import conv2d
    from npe_tpu.ops.mdcl import compose_mdcl_kernel

    kernels = []
    widths = []
    for name in names:
        coeffs = {s: v[f"{name}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
        k = compose_mdcl_kernel(v[f"{name}W"], v[f"{name}_coeff_base"], coeffs, scales)
        kernels.append(k)
        widths.append(k.shape[-1])
    big = jnp.concatenate(kernels, axis=-1)
    out = conv2d(x, big, stride=1, padding=big.shape[0] // 2)
    outs = []
    start = 0
    for w in widths:
        outs.append(out[..., start : start + w])
        start += w
    return outs


# RGB-Beta head implementation: "packed" computes the head's tiny-output-
# channel convolutions (Cout = 6/2/2) in space-to-depth form so the MXU's
# 128-wide output lanes are actually filled; "plain" is the direct form;
# "pallas" fuses the whole packed head (trunk + autoregressive G/B branches
# + sigmoids + Beta means) into one VMEM-resident kernel
# (ops/pallas/mdcl_kernels.py); "auto" = pallas on TPU, packed elsewhere.
# All are the same math (test_models.py / test_pallas.py assert equality).
HEAD_MODE = _os.environ.get("NPE_HEAD_MODE", "auto")


def _composed_mdcl_kernel(v, name, scales):
    from npe_tpu.ops.mdcl import compose_mdcl_kernel

    coeffs = {s: v[f"{name}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
    return compose_mdcl_kernel(v[f"{name}W"], v[f"{name}_coeff_base"], coeffs, scales)


def rgb_beta_head(v, h, scales=(2, 3, 4), mode=None, block=4):
    """Autoregressive RGB-Beta output (reference `IAN.py:183-207`): R from
    trunk features; G from trunk + MDCL(R); B from trunk + MDCL([R, G]); each
    a sigmoid (alpha, beta) pair -> per-channel Beta mean. The three trunk
    MDCLs (R, G_a, B_a) read the same input so they fuse into one conv; the
    G_b / B_b branches stay sequential by construction.

    The packed mode keeps the whole head in space-to-depth form (one s2d at
    entry, one d2s at exit): a 4x4 pixel block folds into channels, turning
    the Cout=6 trunk conv at 64x64 into a Cout=96 conv at 16x16 (~9x less
    MXU lane padding); sigmoid/beta_mean are per-channel so they commute
    with the packing."""
    scales = list(scales)
    mode = mode or HEAD_MODE
    if mode == "auto":
        # End-to-end full-IAN A/B at b256 on v5e (isolated per-head numbers
        # in parentheses, bench_head_ab.py): hybrid 16.3k imgs/s (1.70ms),
        # all-Pallas head 15.8k (1.81ms), XLA packed 15.3k (1.57ms) --
        # in-context scheduling/fusion differ from the isolated chain, and
        # the hybrid (XLA trunk conv + Pallas autoregressive-tail kernel)
        # wins where it counts. "auto" = hybrid on a SINGLE-device TPU
        # process, packed elsewhere: pallas_call has no GSPMD partitioning
        # rule, so inside a sharded program on a multi-device mesh XLA would
        # fail to partition it (or replicate the trunk with all-gathers) --
        # the pure-XLA packed head shards cleanly. Multi-device users who
        # shard-map the head themselves can still opt in via NPE_HEAD_MODE.
        mode = (
            "hybrid"
            if jax.default_backend() == "tpu" and len(jax.devices()) == 1
            else "packed"
        )
    divisible = h.shape[1] % block == 0 and h.shape[2] % block == 0
    if mode == "hybrid" and divisible and block == 4 and max(scales) == 4:
        return _rgb_beta_head_hybrid(v, h, scales, block)
    if mode == "pallas" and divisible and block == 4 and max(scales) == 4:
        from npe_tpu.ops.pallas.mdcl_kernels import rgb_beta_head_pallas

        k_trunk = jnp.concatenate(
            [_composed_mdcl_kernel(v, n, scales) for n in ("R", "G_a", "B_a")], axis=-1
        )
        k_g = _composed_mdcl_kernel(v, "G_b", scales)
        k_b = _composed_mdcl_kernel(v, "B_b", scales)
        return rgb_beta_head_pallas(h, k_trunk, k_g, k_b, block, 1, False)
    if mode in ("packed", "pallas") and divisible:
        return _rgb_beta_head_packed(v, h, scales, block)
    from npe_tpu.ops.activations import sigmoid
    from npe_tpu.ops.beta import beta_mean

    r_pre, ga_pre, ba_pre = mdcl_multi(v, ["R", "G_a", "B_a"], h, scales)
    r = sigmoid(r_pre)
    g = sigmoid(ga_pre + mdcl(v, "G_b", r, scales))
    b = sigmoid(ba_pre + mdcl(v, "B_b", jnp.concatenate([r, g], -1), scales))
    return jnp.concatenate(
        [
            beta_mean(r[..., 0:1], r[..., 1:2]),
            beta_mean(g[..., 0:1], g[..., 1:2]),
            beta_mean(b[..., 0:1], b[..., 1:2]),
        ],
        axis=-1,
    )


def _rgb_beta_head_hybrid(v, h, scales, r):
    """Packed trunk conv in XLA (MXU-compute-bound; XLA's conv scheduling
    wins there) + ONE Pallas kernel for the whole autoregressive tail
    (sigmoids, tiny G_b/B_b MDCLs, Beta means) -- the tail is ~2M MACs spread
    over 8+ XLA dispatches otherwise. Same math as the packed head."""
    from npe_tpu.ops.conv import depth_to_space, pack_kernel_s2d, s2d_block_taps, space_to_depth
    from npe_tpu.ops.pallas.mdcl_kernels import pack_head_taps, rgb_beta_tail_pallas

    rr = r * r
    n, hh, ww = h.shape[0], h.shape[1] // r, h.shape[2] // r
    k_trunk = jnp.concatenate(
        [_composed_mdcl_kernel(v, name, scales) for name in ("R", "G_a", "B_a")], axis=-1
    )
    kp = pack_kernel_s2d(k_trunk.astype(h.dtype), r)  # (T, T, rr*Cin, rr*6) pos-major out
    t = s2d_block_taps(k_trunk.shape[0], r)
    # Emit component-major output channels (comp*rr + pos) straight from the
    # conv so the tail kernel's slices are contiguous lane ranges.
    kp = kp.reshape(t, t, kp.shape[2], rr, 6).swapaxes(-2, -1).reshape(t, t, kp.shape[2], 6 * rr)
    trunk_cm = conv2d(space_to_depth(h, r), kp, stride=1, padding=t // 2)
    tg = pack_head_taps(_composed_mdcl_kernel(v, "G_b", scales).astype(h.dtype), r, True)
    tb = pack_head_taps(_composed_mdcl_kernel(v, "B_b", scales).astype(h.dtype), r, True)
    interpret = jax.default_backend() != "tpu"
    out_cm = rgb_beta_tail_pallas(trunk_cm, tg, tb, rr, 8, interpret)
    out = out_cm.reshape(n, hh, ww, 3, rr).transpose(0, 1, 2, 4, 3).reshape(n, hh, ww, rr * 3)
    return depth_to_space(out, r)


def _rgb_beta_head_packed(v, h, scales, r):
    from npe_tpu.ops.activations import sigmoid
    from npe_tpu.ops.beta import beta_mean
    from npe_tpu.ops.conv import (
        depth_to_space,
        pack_kernel_s2d,
        s2d_block_taps,
        space_to_depth,
    )

    def packed_conv(xp, k):
        t = s2d_block_taps(k.shape[0], r)
        return conv2d(xp, pack_kernel_s2d(k, r), stride=1, padding=t // 2)

    k_trunk = jnp.concatenate(
        [_composed_mdcl_kernel(v, n, scales) for n in ("R", "G_a", "B_a")], axis=-1
    )
    n, hh, ww = h.shape[0], h.shape[1] // r, h.shape[2] // r
    rr = r * r
    trunk = packed_conv(space_to_depth(h, r), k_trunk).reshape(n, hh, ww, rr, 6)
    red = sigmoid(trunk[..., 0:2])
    g_pre = packed_conv(red.reshape(n, hh, ww, rr * 2), _composed_mdcl_kernel(v, "G_b", scales))
    grn = sigmoid(trunk[..., 2:4] + g_pre.reshape(n, hh, ww, rr, 2))
    rg = jnp.concatenate([red, grn], axis=-1).reshape(n, hh, ww, rr * 4)
    b_pre = packed_conv(rg, _composed_mdcl_kernel(v, "B_b", scales))
    blu = sigmoid(trunk[..., 4:6] + b_pre.reshape(n, hh, ww, rr, 2))
    out = jnp.concatenate(
        [beta_mean(c[..., 0:1], c[..., 1:2]) for c in (red, grn, blu)], axis=-1
    )
    return depth_to_space(out.reshape(n, hh, ww, rr * 3), r)


# Fused single-Pallas-kernel inference MDBLOCK (ops/pallas/mdcl_kernels.py):
# "auto" uses it on TPU for channel widths whose tap matrices fit VMEM;
# "off" (default) always takes the per-op XLA path. Measured on v5e the two
# are within ~3% of each other -- the MDCL branch convs are compute-bound at
# the MXU roofline (905M MACs/img per mdblock), so there is nothing left for
# fusion to reclaim; XLA's conv path wins by a hair and needs no custom VJP.
# The kernel stays as a tested deployment option (bench_mdblock_ab.py).
MDBLOCK_FUSED = _os.environ.get("NPE_MDBLOCK_FUSED", "off")


def _bn_affine(v, name):
    import jax.numpy as _jnp

    s = (v[f"{name}.gamma"] * v[f"{name}.inv_std"]).astype(_jnp.float32)
    t = v[f"{name}.beta"].astype(_jnp.float32) - v[f"{name}.mean"].astype(_jnp.float32) * s
    return s, t


def _mdblock_fused_enabled():
    """'force' enables the fused kernel anywhere (interpret mode off-TPU --
    lets CPU tests exercise the real dispatch path incl. in-situ tap/affine
    assembly); 'auto' requires a single-device TPU process (pallas_call has
    no GSPMD partitioning rule, same gate as the head's 'auto')."""
    if MDBLOCK_FUSED == "force":
        return True
    return (
        MDBLOCK_FUSED == "auto"
        and jax.default_backend() == "tpu"
        and len(jax.devices()) == 1
    )


def mdblock(v, upd, name, x, scales, act, train):
    """MDBLOCK (reference `layers.py:411-416`): pre-activation residual
    nl(BN2(x + MDCL2(nl(BN1(MDCL1(nl(BN0(x))))))))."""
    if (
        not train
        and act is LRELU
        and _mdblock_fused_enabled()
        and x.shape[-1] <= 256
        and x.shape[1] >= 8
    ):
        from npe_tpu.ops.pallas.mdcl_kernels import mdblock_fused, tap_offsets

        taps1, taps2 = (
            _stacked_mdcl_taps(v, n, scales) for n in (name, f"{name}2")
        )
        affines = sum((_bn_affine(v, f"{name}bnorm{i}") for i in range(3)), ())
        return mdblock_fused(
            x,
            taps1,
            taps2,
            affines,
            tap_offsets(scales),
            interpret=jax.default_backend() != "tpu",
        )
    h = act(bn(v, upd, f"{name}bnorm0", x, train))
    h = mdcl(v, name, h, scales)
    h = act(bn(v, upd, f"{name}bnorm1", h, train))
    h = mdcl(v, f"{name}2", h, scales)
    return act(bn(v, upd, f"{name}bnorm2", x + h, train))


def _stacked_mdcl_taps(v, name, scales):
    from npe_tpu.ops.pallas.mdcl_kernels import stack_mdcl_taps

    coeffs = {s: v[f"{name}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
    return stack_mdcl_taps(v[f"{name}W"], v[f"{name}_coeff_base"], coeffs, scales)


def init_encoder(vb, num_latents, in_channels=3, widths=(128, 256, 512, 1024), fc=1000):
    """Shared encoder + discriminator head parameters. `widths`/`fc` default
    to the reference tower (`IAN_simple.py:73-126`); the apply paths read
    shapes from the weights, so narrow test profiles reuse the same code."""
    vb.conv("enc_conv1", in_channels, widths[0], bias=True)
    vb.conv("enc_conv2", widths[0], widths[1], bias=False)
    vb.bn("bnorm2", widths[1])
    vb.conv("enc_conv3", widths[1], widths[2], bias=False)
    vb.bn("bnorm3", widths[2])
    vb.conv("enc_conv4", widths[2], widths[3], bias=False)
    vb.bn("bnorm4", widths[3])
    vb.dense("enc_fc1", widths[3] * 4 * 4, fc, bias=False)
    vb.bn("bnorm_enc_fc1", fc)
    vb.dense("enc_mu", fc, num_latents, bias=False)
    vb.bn("mu_bnorm", num_latents)
    vb.dense("enc_logsigma", fc, num_latents, bias=False)
    vb.bn("ls_bnorm", num_latents)


def init_discrim(vb, n_units, w_std, feat=1024, n_kernels=500, dim_per_kernel=5):
    vb.minibatch("minibatch_discrim", feat, n_kernels, dim_per_kernel)
    vb.dense("discrimi", feat + n_kernels, n_units, std=w_std, bias=False)


LRELU = lrelu(0.2)


def apply_backbone(v, x, train, upd):
    """Encoder conv tower -> the four introspection feature maps
    (reference `l_introspect = [enc_conv1..4]`, `IAN_simple.py:240`).
    x: (N, 64, 64, 3) NHWC in [-1, 1]."""
    c1 = LRELU(enc_conv2d(x, v["enc_conv1.W"], b=v["enc_conv1.b"]))
    c2 = LRELU(bn(v, upd, "bnorm2", enc_conv2d(c1, v["enc_conv2.W"]), train))
    c3 = LRELU(bn(v, upd, "bnorm3", enc_conv2d(c2, v["enc_conv3.W"]), train))
    c4 = LRELU(bn(v, upd, "bnorm4", enc_conv2d(c3, v["enc_conv4.W"]), train))
    return c1, c2, c3, c4


def apply_latent_heads(v, c4, train, upd, act=elu):
    """conv4 -> fc1 -> batchnormed (mu, logsigma). `act` is the enc_fc1
    nonlinearity: elu for IAN_simple (`IAN_simple.py:121`), relu for the
    full IAN and IANv1 (`IAN.py:121`, `IANv1.py:114`)."""
    f = act(bn(v, upd, "bnorm_enc_fc1", dense(c4, v["enc_fc1.W"]), train))
    mu = bn(v, upd, "mu_bnorm", dense(f, v["enc_mu.W"]), train)
    ls = bn(v, upd, "ls_bnorm", dense(f, v["enc_logsigma.W"]), train)
    return mu, ls


def apply_discrim_head(v, c4):
    """GlobalPool -> minibatch discrimination -> dense LOGITS (the reference
    applies sigmoid/softmax in-layer; callers here apply it, keeping the
    training losses numerically stable)."""
    pooled = global_avg_pool(c4)
    f = minibatch_discrimination(
        pooled,
        v["minibatch_discrim.theta"],
        v["minibatch_discrim.log_weight_scale"],
        v["minibatch_discrim.b"],
    )
    return dense(f, v["discrimi.W"])


def unflatten_nchw(y, c, h, w):
    """Lasagne ReshapeLayer([0], C, H, W) semantics on an NHWC pipeline:
    reshape C-order then put channels last."""
    return y.reshape(y.shape[0], c, h, w).transpose(0, 2, 3, 1)
