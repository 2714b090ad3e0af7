"""Library-extra blocks from the reference layer library -- not used by the
three shipped configs but part of the component inventory (SURVEY.md
section 2.3): MDC up/downsample prototypes (`USL`/`DSL`,
`layers.py:262-391`), inception-style blocks (`layers.py:527-607`), and the
residual sugar `ResLayer` (`layers.py:636-637`).

Like MDCL, the USL/DSL shared-filter branch sums are expressed as composed
kernels where possible; branches that differ in geometry (upsample, pooling)
stay separate convs -- XLA fuses the elementwise sums.
"""

import jax.numpy as jnp

from npe_tpu.ops.activations import elu
from npe_tpu.ops.conv import avg_pool, conv2d, deconv2d, dilated_conv2d, max_pool, upscale2d
from npe_tpu.ops.initializers import normal, constant
from npe_tpu.ops.linear import dense
from npe_tpu.ops.mdcl import mdcl_apply


def usl_init(vb, name, cin, cout, scales, std=0.02):
    """MDC-based upsample block params (reference `USL`, `layers.py:262-325`):
    one shared 3x3 W, per-branch coefficients, plus a deconv coefficient."""
    vb.mdcl(name, cin, cout, scales, std=std)
    vb.v[f"{name}_coeff_deconv"] = jnp.full(cout, 1.0 / (1 + len(scales)))


def usl_apply(v, name, x, scales):
    """Upscale2D + MDCL branches on the upscaled input, plus a stride-2
    deconv of the shared filter, all summed."""
    up = upscale2d(x, 2)
    coeffs = {s: v[f"{name}_coeff_{'1x1' if s == 0 else s}"] for s in scales}
    out = mdcl_apply(up, v[f"{name}W"], v[f"{name}_coeff_base"], coeffs, scales)
    # deconv branch: shared W as a 3x3 stride-2 transposed conv (crop 1)
    w = v[f"{name}W"] * v[f"{name}_coeff_deconv"]
    out = out + deconv2d(x, w, stride=2, crop=1)
    return out


def dsl_init(vb, name, cin, cout, scales, std=0.02):
    """MDC-based downsample block params (reference `DSL`, `layers.py:331-391`)."""
    vb.mdcl(name, cin, cout, scales, std=std)


def dsl_apply(v, name, x, scales):
    """Stride-2 3x3 conv + [avg-pool(scale) -> 3x3 conv] branches + 1x1
    stride-2 mean-filter conv, summed (reference geometry, with the
    reference's ad-hoc pool padding regularized to 'SAME')."""
    w = v[f"{name}W"]
    out = conv2d(x, w * v[f"{name}_coeff_base"], stride=2, padding=1)
    for s in scales:
        if s == 0:
            continue
        c = v[f"{name}_coeff_{s}"]
        p = avg_pool(x, s, 2, padding="SAME")
        out = out + conv2d(p, w * c, stride=1, padding=1)
    if 0 in scales:
        w1 = jnp.mean(w, axis=(0, 1), keepdims=True) * v[f"{name}_coeff_1x1"]
        out = out + conv2d(x, w1, stride=2, padding=0)
    return out


def res_layer(x, block_out, nonlinearity):
    """`ResLayer` (`layers.py:636-637`): NL(x + block(x))."""
    return nonlinearity(x + block_out)


# --- inception-style blocks (`layers.py:527-607`) -----------------------------


def pd(num_layers=2, num_filters=32, filter_size=3, pad=1, stride=1, nonlinearity=elu, style="convolutional", bnorm=1, **kwargs):
    """Param-dict generator (reference `pd`, `layers.py:604-607`): broadcasts
    scalars to per-layer lists."""
    args = dict(
        num_filters=num_filters,
        filter_size=filter_size,
        pad=pad,
        stride=stride,
        nonlinearity=nonlinearity,
        style=style,
        bnorm=bnorm,
        **kwargs,
    )
    return {k: (v if isinstance(v, list) else [v] * num_layers) for k, v in args.items()}


def inception_init(vb, name, cin, param_dicts):
    """Init params for an inception block: one branch per dict, each a stack
    of conv/dilation/dense steps with optional batch norm."""
    for i, d in enumerate(param_dicts):
        ch = cin
        for j, style in enumerate(d["style"]):
            lname = f"{name}_{i}_{j}"
            nf = d["num_filters"][j]
            fs = d["filter_size"][j]
            if style in ("convolutional", "dilation"):
                vb.v[f"{lname}.W"] = normal(0.02)(vb.key(), (fs, fs, ch, nf))
                vb.v[f"{lname}.b"] = jnp.zeros(nf)
                ch = nf
            elif style == "dense":
                # applied to flattened features; caller must know geometry
                vb.v[f"{lname}.W"] = normal(0.02)(vb.key(), (ch, nf))
                vb.v[f"{lname}.b"] = jnp.zeros(nf)
                ch = nf
            # 'pool' has no params
            if d["bnorm"][j]:
                vb.bn(f"{name}_bnorm_{i}_{j}", ch)


def inception_apply(v, upd, name, x, param_dicts, train=False, upscale=False):
    """Run the block; returns channel-concat of branch outputs (reference
    `InceptionLayer` / `InceptionUpscaleLayer`)."""
    from npe_tpu.models.common import bn as bn_apply

    outs = []
    for i, d in enumerate(param_dicts):
        h = x
        for j, style in enumerate(d["style"]):
            lname = f"{name}_{i}_{j}"
            nl = d["nonlinearity"][j]
            stride = d["stride"][j]
            padv = d.get("pad", [0] * len(d["style"])) [j]
            if style == "convolutional":
                if upscale:
                    h = deconv2d(h, v[f"{lname}.W"], stride=stride, crop=padv, b=v[f"{lname}.b"]) if stride > 1 else conv2d(h, v[f"{lname}.W"], 1, padv, b=v[f"{lname}.b"])
                else:
                    h = conv2d(h, v[f"{lname}.W"], stride=stride, padding=padv, b=v[f"{lname}.b"])
            elif style == "dilation":
                h = dilated_conv2d(h, v[f"{lname}.W"], d["dilation"][j])
            elif style == "pool":
                mode = d.get("mode", ["average_exc_pad"] * len(d["style"]))[j]
                pool = max_pool if mode == "max" else avg_pool
                if upscale:
                    h = upscale2d(h, stride)
                    h = pool(h, d["filter_size"][j], 1, padding="SAME")
                else:
                    h = pool(h, d["filter_size"][j], stride, padding="SAME")
            elif style == "dense":
                h = dense(h, v[f"{lname}.W"], v[f"{lname}.b"])
            if nl is not None:
                h = nl(h)
            if d["bnorm"][j]:
                h = bn_apply(v, upd, f"{name}_bnorm_{i}_{j}", h, train)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1)
