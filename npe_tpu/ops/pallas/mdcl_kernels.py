"""Fused Pallas TPU kernel for the inference-mode MDBLOCK.

MDBLOCK (reference `layers.py:411-416`) is
    y = lrelu(BN2(x + MDCL2(lrelu(BN1(MDCL1(lrelu(BN0(x))))))))
where each MDCL is a sum of a base 3x3 conv plus one rhs-dilated 3x3 conv
per scale sharing the same filter (reference `layers.py:207-258`).

As separate XLA ops this is 6+ convolutions and 3 normalization chains, each
round-tripping the (N, H, W, C) activation through HBM. At the decoder's
16x16x256 / 32x32x128 stage sizes the whole working set fits in VMEM, so
this kernel runs the entire block in ONE pass:

- inference BN folds to a per-channel affine (s = gamma*inv_std,
  t = beta - mean*gamma*inv_std), computed by the caller;
- each MDCL is a sum over its nonzero taps of a shifted (H, W) slice of the
  zero-padded activation matmul'd with that tap's (C, C) matrix on the MXU
  (per-output-channel branch coefficients folded into the tap matrices by
  the caller) -- no structurally-zero tap is ever computed;
- intermediate activations never leave VMEM; accumulation is f32, matmul
  inputs bf16 (MXU-native).

The backward pass is delegated to the XLA reference formulation via
jax.custom_vjp (mdblock_taps_reference below), so jax.grad through the
editor/serving paths stays exact while the forward runs fused.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tap_offsets(scales):
    """Static (dy, dx) offset list: base 3x3 (dilation 1, with the scale-0
    1x1-mean branch folded into its center by the caller), then one dilated
    3x3 per scale > 0. Order matches stack_mdcl_taps."""
    offs = []
    for s in [1] + [s for s in scales if s > 0]:
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                offs.append((dy, dx))
    return tuple(offs)


def stack_mdcl_taps(w, coeff_base, scale_coeffs, scales):
    """(T, Cin, Cout) per-tap matrices for tap_offsets(scales), coefficients
    folded in. w: (3, 3, Cin, Cout) shared base filter."""
    base = w * coeff_base
    if 0 in scales:
        base = base.at[1, 1].add(jnp.mean(w, axis=(0, 1)) * scale_coeffs[0])
    mats = [base[i, j] for i in range(3) for j in range(3)]
    for s in scales:
        if s > 0:
            ws = w * scale_coeffs[s]
            mats += [ws[i, j] for i in range(3) for j in range(3)]
    return jnp.stack(mats)


def _lrelu(x, alpha=0.2):
    return jnp.where(x >= 0, x, alpha * x)


def _mdcl_sum(h, taps_ref, offs, pad, mx_dtype):
    """h: (NB, H, W, C) f32 value; returns (NB, H, W, C) f32: the multi-
    dilation conv as a sum of shifted-slice matmuls (static offsets).
    mx_dtype: matmul input dtype (bf16 on the MXU path; f32 when the caller
    runs in f32 so the interpret-mode tests are exact)."""
    nb, hh, ww, c = h.shape
    hp = jnp.pad(h.astype(mx_dtype), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((nb * hh * ww, taps_ref.shape[2]), jnp.float32)
    for t, (dy, dx) in enumerate(offs):
        sl = hp[:, pad + dy : pad + dy + hh, pad + dx : pad + dx + ww, :]
        acc = acc + jnp.dot(
            sl.reshape(nb * hh * ww, c),
            taps_ref[t],
            preferred_element_type=jnp.float32,
        )
    return acc.reshape(nb, hh, ww, taps_ref.shape[2])


def _kernel(offs, pad, x_ref, taps1_ref, taps2_ref, aff_ref, out_ref):
    # aff_ref: (6, C) f32 rows = s0, t0, s1, t1, s2, t2
    mx = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    h = _lrelu(x * aff_ref[0] + aff_ref[1])
    h = _mdcl_sum(h, taps1_ref, offs, pad, mx)
    h = _lrelu(h * aff_ref[2] + aff_ref[3])
    h = _mdcl_sum(h, taps2_ref, offs, pad, mx)
    y = _lrelu((x + h) * aff_ref[4] + aff_ref[5])
    out_ref[:] = y.astype(out_ref.dtype)


def mdblock_taps_reference(x, taps1, taps2, affines, offs):
    """Pure-jnp formulation of exactly what the kernel computes (also the
    custom-VJP backward). Tap matmuls expressed as 1x1-conv-style einsum
    over zero-padded shifts."""
    s0, t0, s1, t1, s2, t2 = affines

    def mdcl(h, taps):
        pad = max(abs(o) for off in offs for o in off)
        hp = jnp.pad(h, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = 0.0
        for t, (dy, dx) in enumerate(offs):
            sl = hp[:, pad + dy : pad + dy + h.shape[1], pad + dx : pad + dx + h.shape[2], :]
            out = out + jnp.einsum("nhwc,cd->nhwd", sl, taps[t])
        return out

    xf = x.astype(jnp.float32)
    h = _lrelu(xf * s0 + t0)
    h = mdcl(h.astype(x.dtype).astype(jnp.float32), taps1.astype(jnp.float32))
    h = _lrelu(h * s1 + t1)
    h = mdcl(h.astype(x.dtype).astype(jnp.float32), taps2.astype(jnp.float32))
    return _lrelu((xf + h) * s2 + t2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def mdblock_fused(x, taps1, taps2, affines, offs, block_n=4, interpret=False):
    """Fused inference MDBLOCK. x: (N, H, W, C); taps_k: (T, C, C);
    affines: 6-tuple of (C,) f32 (s0, t0, s1, t1, s2, t2); offs: static
    tuple from tap_offsets. N must be divisible by block_n."""
    return _mdblock_fused_impl(x, taps1, taps2, affines, offs, block_n, interpret)


def _mdblock_fused_impl(x, taps1, taps2, affines, offs, block_n, interpret):
    n, hh, ww, c = x.shape
    nb = block_n
    while n % nb:
        nb //= 2
    nb = max(nb, 1)
    pad = max(abs(o) for off in offs for o in off)
    aff = jnp.stack([a.astype(jnp.float32) for a in affines])
    kern = functools.partial(_kernel, offs, pad)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hh, ww, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, hh, ww, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, taps1.astype(x.dtype), taps2.astype(x.dtype), aff)


def _fused_fwd(x, taps1, taps2, affines, offs, block_n, interpret):
    y = _mdblock_fused_impl(x, taps1, taps2, affines, offs, block_n, interpret)
    return y, (x, taps1, taps2, affines)


def _fused_bwd(offs, block_n, interpret, res, g):
    x, taps1, taps2, affines = res
    _, vjp = jax.vjp(
        lambda x, t1, t2, aff: mdblock_taps_reference(x, t1, t2, aff, offs),
        x,
        taps1,
        taps2,
        affines,
    )
    return vjp(g)


mdblock_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused RGB-Beta head (reference `IAN.py:183-207`).
#
# The whole autoregressive head -- trunk MDCLs for R/G_a/B_a (one fused
# Cout=6 conv), sigmoid, the G_b/B_b MDCLs over the already-computed color
# channels, and the per-channel Beta means -- runs in ONE kernel over the
# space-to-depth(4) layout: the 64x64x128 trunk input folds to 16x16x2048,
# every conv becomes 9 shifted-slice matmuls over full-width channels (no
# structurally-zero taps, ~9x less MXU output-lane padding than the dense
# Cout=6 form), and the intermediate color maps never leave VMEM.
# ---------------------------------------------------------------------------


def _tap_matmul_sum(hp, taps_ref, hh, ww):
    """hp: (NB, HH+2, WW+2, C) padded value; 9 unit-offset taps."""
    nb = hp.shape[0]
    c = hp.shape[3]
    acc = jnp.zeros((nb * hh * ww, taps_ref.shape[2]), jnp.float32)
    t = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sl = hp[:, 1 + dy : 1 + dy + hh, 1 + dx : 1 + dx + ww, :]
            acc = acc + jnp.dot(
                sl.reshape(nb * hh * ww, c), taps_ref[t], preferred_element_type=jnp.float32
            )
            t += 1
    return acc


def _beta_head_kernel(rr, xs_ref, tr_ref, tg_ref, tb_ref, out_ref):
    # xs_ref: (NB, HH, WW, rr*C) space-to-depth input (pixel-position-major
    # channels). All kernel-internal color maps are COMPONENT-major
    # (channel = component*rr + position) so every slice/concat below is a
    # contiguous lane range -- the permutation lives in the tap matrices.
    nb, hh, ww = xs_ref.shape[0], xs_ref.shape[1], xs_ref.shape[2]
    mx = xs_ref.dtype
    rows = nb * hh * ww

    def pad1(v):
        return jnp.pad(v.astype(mx), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def unflat(v2d, c):
        return v2d.reshape(nb, hh, ww, c)

    trunk = _tap_matmul_sum(pad1(xs_ref[:]), tr_ref, hh, ww)  # (rows, 6*rr)
    red = jax.nn.sigmoid(trunk[:, 0 : 2 * rr])  # [R_alpha(rr), R_beta(rr)]
    g_pre = _tap_matmul_sum(pad1(unflat(red, 2 * rr)), tg_ref, hh, ww)
    grn = jax.nn.sigmoid(trunk[:, 2 * rr : 4 * rr] + g_pre)
    rg = jnp.concatenate([red, grn], axis=-1)  # [Ra, Rb, Ga, Gb] blocks
    b_pre = _tap_matmul_sum(pad1(unflat(rg, 4 * rr)), tb_ref, hh, ww)
    blu = jax.nn.sigmoid(trunk[:, 4 * rr : 6 * rr] + b_pre)

    def beta(c2):
        a, b = c2[:, 0:rr], c2[:, rr : 2 * rr]
        return 2.0 * (a / (a + b + 1e-8)) - 1.0

    out = jnp.concatenate([beta(red), beta(grn), beta(blu)], axis=-1)  # (rows, 3*rr)
    out_ref[:] = unflat(out, 3 * rr).astype(out_ref.dtype)


def pack_head_taps(k, r, in_comp_major, out_comp_major=True):
    """Dense composed MDCL kernel (K, K, Cin, Cout) -> s2d(r)-space per-tap
    matrices (9, r*r*Cin, r*r*Cout) for the 3x3 cell footprint (requires the
    9x9 scales-[2,3,4] kernel at r=4). in/out_comp_major choose the packed
    channel order: position-major (pos*C + c, the space_to_depth layout) or
    component-major (c*r*r + pos, the kernel-internal layout)."""
    from npe_tpu.ops.conv import pack_kernel_s2d, s2d_block_taps

    t = s2d_block_taps(k.shape[0], r)
    assert t == 3, (k.shape, r)
    rr = r * r
    cin, cout = k.shape[2], k.shape[3]
    kp = pack_kernel_s2d(k, r).reshape(t, t, rr, cin, rr, cout)
    if in_comp_major:
        kp = kp.swapaxes(2, 3)  # -> (t, t, cin, rr, rr, cout)
    if out_comp_major:
        kp = kp.swapaxes(-2, -1)
    return kp.reshape(t * t, rr * cin, rr * cout)


def rgb_beta_head_reference_packed(x, k_trunk, k_g, k_b, r):
    """Pure-jnp formulation of the kernel's math (custom-VJP backward):
    identical to models/common's packed head, expressed over dense kernels."""
    from npe_tpu.ops.conv import conv2d, depth_to_space, pack_kernel_s2d, space_to_depth

    n, hh, ww = x.shape[0], x.shape[1] // r, x.shape[2] // r
    rr = r * r
    xs = space_to_depth(x, r)
    trunk = conv2d(xs, pack_kernel_s2d(k_trunk, r), stride=1, padding=1)
    trunk = trunk.reshape(n, hh, ww, rr, 6)
    red = jax.nn.sigmoid(trunk[..., 0:2])
    g_pre = conv2d(red.reshape(n, hh, ww, rr * 2), pack_kernel_s2d(k_g, r), stride=1, padding=1)
    grn = jax.nn.sigmoid(trunk[..., 2:4] + g_pre.reshape(n, hh, ww, rr, 2))
    rg = jnp.concatenate([red, grn], axis=-1).reshape(n, hh, ww, rr * 4)
    b_pre = conv2d(rg, pack_kernel_s2d(k_b, r), stride=1, padding=1)
    blu = jax.nn.sigmoid(trunk[..., 4:6] + b_pre.reshape(n, hh, ww, rr, 2))

    def beta(c):
        return 2.0 * (c[..., 0:1] / (c[..., 0:1] + c[..., 1:2] + 1e-8)) - 1.0

    out = jnp.concatenate([beta(red), beta(grn), beta(blu)], axis=-1)
    return depth_to_space(out.reshape(n, hh, ww, rr * 3), r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rgb_beta_head_pallas(x, k_trunk, k_g, k_b, r=4, block_n=1, interpret=False):
    """Fused RGB-Beta head. x: (N, H, W, C); k_*: dense composed MDCL
    kernels (9, 9, Cin, Cout) for trunk (Cout=6) / G_b (2->2) / B_b (4->2);
    H, W divisible by r; the 9x9 kernels require r=4."""
    return _beta_head_impl(x, k_trunk, k_g, k_b, r, block_n, interpret)


def _beta_head_impl(x, k_trunk, k_g, k_b, r, block_n, interpret):
    from npe_tpu.ops.conv import depth_to_space, space_to_depth

    n, h, w, c = x.shape
    nb = block_n
    while n % nb:
        nb //= 2
    nb = max(nb, 1)
    hh, ww, rr = h // r, w // r, r * r
    xs = space_to_depth(x, r)
    taps = [
        pack_head_taps(k.astype(x.dtype), r, in_comp_major=cm)
        for k, cm in ((k_trunk, False), (k_g, True), (k_b, True))
    ]
    kern = functools.partial(_beta_head_kernel, rr)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, 3 * rr), x.dtype),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hh, ww, rr * c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, hh, ww, 3 * rr), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xs, *taps)
    # Kernel output is component-major (c*rr + pos); depth_to_space wants
    # position-major (pos*3 + c).
    out = out.reshape(n, hh, ww, 3, rr).transpose(0, 1, 2, 4, 3).reshape(n, hh, ww, rr * 3)
    return depth_to_space(out, r)


# ---------------------------------------------------------------------------
# Hybrid head: XLA computes the trunk conv (it is MXU-compute-bound, where
# XLA's conv scheduling beats a hand kernel), then ONE small Pallas kernel
# runs the whole autoregressive tail -- sigmoids, the tiny G_b/B_b MDCLs over
# the color channels, and the Beta means (reference `IAN.py:189-207`). As
# separate XLA ops the tail is ~2M MACs spread over 8+ dispatches, each
# round-tripping small tensors through HBM; fused it is one VMEM-resident
# pass. Unlike rgb_beta_head_pallas, the 2048-wide packed trunk INPUT never
# enters this kernel, so many images fit per grid step.
# ---------------------------------------------------------------------------


def _beta_tail_kernel(rr, tr_ref, tg_ref, tb_ref, out_ref):
    # tr_ref: (NB, HH, WW, 6*rr) component-major trunk pre-activations.
    nb, hh, ww = tr_ref.shape[0], tr_ref.shape[1], tr_ref.shape[2]
    mx = tr_ref.dtype
    rows = nb * hh * ww
    trunk = tr_ref[:].astype(jnp.float32).reshape(rows, 6 * rr)

    def pad1(v):
        return jnp.pad(v.astype(mx), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def unflat(v2d, c):
        return v2d.reshape(nb, hh, ww, c)

    red = jax.nn.sigmoid(trunk[:, 0 : 2 * rr])
    g_pre = _tap_matmul_sum(pad1(unflat(red, 2 * rr)), tg_ref, hh, ww)
    grn = jax.nn.sigmoid(trunk[:, 2 * rr : 4 * rr] + g_pre)
    rg = jnp.concatenate([red, grn], axis=-1)
    b_pre = _tap_matmul_sum(pad1(unflat(rg, 4 * rr)), tb_ref, hh, ww)
    blu = jax.nn.sigmoid(trunk[:, 4 * rr : 6 * rr] + b_pre)

    def beta(c2):
        a, b = c2[:, 0:rr], c2[:, rr : 2 * rr]
        return 2.0 * (a / (a + b + 1e-8)) - 1.0

    out = jnp.concatenate([beta(red), beta(grn), beta(blu)], axis=-1)
    out_ref[:] = unflat(out, 3 * rr).astype(out_ref.dtype)


def rgb_beta_tail_reference(trunk_cm, tg_taps, tb_taps, rr):
    """Pure-jnp formulation of _beta_tail_kernel (also the custom-VJP
    backward). trunk_cm: (N, HH, WW, 6*rr) component-major; taps from
    pack_head_taps(..., in_comp_major=True)."""
    hh, ww = trunk_cm.shape[1], trunk_cm.shape[2]

    def tap_conv(h, taps):
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = 0.0
        t = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sl = hp[:, 1 + dy : 1 + dy + hh, 1 + dx : 1 + dx + ww, :]
                out = out + jnp.einsum(
                    "nhwc,cd->nhwd", sl.astype(jnp.float32), taps[t].astype(jnp.float32)
                )
                t += 1
        return out

    trunk = trunk_cm.astype(jnp.float32)
    red = jax.nn.sigmoid(trunk[..., 0 : 2 * rr])
    g_pre = tap_conv(red.astype(trunk_cm.dtype), tg_taps.astype(trunk_cm.dtype))
    grn = jax.nn.sigmoid(trunk[..., 2 * rr : 4 * rr] + g_pre)
    rg = jnp.concatenate([red, grn], axis=-1)
    b_pre = tap_conv(rg.astype(trunk_cm.dtype), tb_taps.astype(trunk_cm.dtype))
    blu = jax.nn.sigmoid(trunk[..., 4 * rr : 6 * rr] + b_pre)

    def beta(c2):
        a, b = c2[..., 0:rr], c2[..., rr : 2 * rr]
        return 2.0 * (a / (a + b + 1e-8)) - 1.0

    out = jnp.concatenate([beta(red), beta(grn), beta(blu)], axis=-1)
    return out.astype(trunk_cm.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def rgb_beta_tail_pallas(trunk_cm, tg_taps, tb_taps, rr, block_n=8, interpret=False):
    """Fused autoregressive RGB-Beta tail. trunk_cm: (N, HH, WW, 6*rr)
    component-major trunk pre-activations; tg_taps (9, 2rr, 2rr) / tb_taps
    (9, 4rr, 2rr) from pack_head_taps(in_comp_major=True). Returns
    (N, HH, WW, 3*rr) component-major Beta means."""
    return _beta_tail_impl(trunk_cm, tg_taps, tb_taps, rr, block_n, interpret)


def _beta_tail_impl(trunk_cm, tg_taps, tb_taps, rr, block_n, interpret):
    n, hh, ww, c6 = trunk_cm.shape
    nb = block_n
    while n % nb:
        nb //= 2
    nb = max(nb, 1)
    kern = functools.partial(_beta_tail_kernel, rr)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, 3 * rr), trunk_cm.dtype),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hh, ww, c6), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, hh, ww, 3 * rr), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(trunk_cm, tg_taps.astype(trunk_cm.dtype), tb_taps.astype(trunk_cm.dtype))


def _tail_fwd(trunk_cm, tg_taps, tb_taps, rr, block_n, interpret):
    y = _beta_tail_impl(trunk_cm, tg_taps, tb_taps, rr, block_n, interpret)
    return y, (trunk_cm, tg_taps, tb_taps)


def _tail_bwd(rr, block_n, interpret, res, g):
    trunk_cm, tg_taps, tb_taps = res
    _, vjp = jax.vjp(
        lambda t, kg, kb: rgb_beta_tail_reference(t, kg, kb, rr), trunk_cm, tg_taps, tb_taps
    )
    return vjp(g)


rgb_beta_tail_pallas.defvjp(_tail_fwd, _tail_bwd)


def _head_fwd(x, k_trunk, k_g, k_b, r, block_n, interpret):
    y = _beta_head_impl(x, k_trunk, k_g, k_b, r, block_n, interpret)
    return y, (x, k_trunk, k_g, k_b)


def _head_bwd(r, block_n, interpret, res, g):
    x, k_trunk, k_g, k_b = res
    _, vjp = jax.vjp(
        lambda x, kt, kg, kb: rgb_beta_head_reference_packed(x, kt, kg, kb, r),
        x,
        k_trunk,
        k_g,
        k_b,
    )
    return vjp(g)


rgb_beta_head_pallas.defvjp(_head_fwd, _head_bwd)
