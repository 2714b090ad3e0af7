"""End-to-end converter goldens: COMPLETE reference-layout checkpoints for
ALL THREE configs (every Lasagne-named param, OIHW / (cin,cout,kh,kw) /
NCHW-flatten layouts; MDCL shared filters + per-scale coefficients; MADE
weights with masks regenerated from `made_orderings` metadata) are ported
through utils/convert.py and must produce the SAME encoder, decoder, and
discriminator activations as torch NCHW replicas of the reference graphs
(`IAN_simple.py:56-241`, `IAN.py:67-228`, `IANv1.py:63-222`,
`GANcheckpoints.py:11-57`, MDCL `layers.py:207-258`, MADE
`layers.py:735-853`).

torch conv2d == cuDNN cross-correlation (flip_filters=False), so it stands
in for Theano+cuDNN exactly as in tests/test_convert.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

pytestmark = pytest.mark.slow

from npe_tpu.models import common, get_config
from npe_tpu.utils.convert import convert_param


def _reference_checkpoint(rng):
    """Random IAN_simple weights in the REFERENCE layout."""
    p = {}

    def bn(name, c):
        p[f"{name}.beta"] = rng.randn(c).astype(np.float32) * 0.1
        p[f"{name}.gamma"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        p[f"{name}.mean"] = rng.randn(c).astype(np.float32) * 0.1
        p[f"{name}.inv_std"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    # encoder tower (OIHW)
    p["enc_conv1.W"] = rng.randn(128, 3, 5, 5).astype(np.float32) * 0.02
    p["enc_conv1.b"] = rng.randn(128).astype(np.float32) * 0.02
    p["enc_conv2.W"] = rng.randn(256, 128, 5, 5).astype(np.float32) * 0.02
    bn("bnorm2", 256)
    p["enc_conv3.W"] = rng.randn(512, 256, 5, 5).astype(np.float32) * 0.02
    bn("bnorm3", 512)
    p["enc_conv4.W"] = rng.randn(1024, 512, 5, 5).astype(np.float32) * 0.02
    bn("bnorm4", 1024)
    # fc heads (reference flattens NCHW)
    p["enc_fc1.W"] = rng.randn(1024 * 16, 1000).astype(np.float32) * 0.02
    bn("bnorm_enc_fc1", 1000)
    p["enc_mu.W"] = rng.randn(1000, 100).astype(np.float32) * 0.02
    bn("mu_bnorm", 100)
    p["enc_logsigma.W"] = rng.randn(1000, 100).astype(np.float32) * 0.02
    bn("ls_bnorm", 100)
    # decoder
    p["l_dec_fc2.W"] = rng.randn(100, 1024 * 16).astype(np.float32) * 0.02
    bn("bnorm_dec_fc2", 1024 * 16)
    p["dec_conv1.W"] = rng.randn(1024, 512, 5, 5).astype(np.float32) * 0.02
    bn("bnorm_dc1", 512)
    p["dec_conv2.W"] = rng.randn(512, 256, 5, 5).astype(np.float32) * 0.02
    bn("bnorm_dc2", 256)
    p["dec_conv3.W"] = rng.randn(256, 128, 5, 5).astype(np.float32) * 0.02
    bn("bnorm_dc3", 128)
    p["dec_out.W"] = rng.randn(128, 3, 5, 5).astype(np.float32) * 0.02
    # discriminator head
    p["minibatch_discrim.theta"] = rng.randn(1024, 500, 5).astype(np.float32) * 0.05
    p["minibatch_discrim.log_weight_scale"] = rng.randn(500, 5).astype(np.float32) * 0.1
    p["minibatch_discrim.b"] = np.full(500, -1.0, np.float32)
    p["discrimi.W"] = rng.randn(1024 + 500, 1).astype(np.float32) * 0.01
    return p


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _bn_eval(p, name, x):
    """Lasagne eval-mode BN: (x - mean) * (gamma * inv_std) + beta, channel
    axis 1 for 4-D NCHW, axis 1 for 2-D."""
    shape = (1, -1, 1, 1) if x.dim() == 4 else (1, -1)
    return (x - _t(p[f"{name}.mean"]).view(shape)) * (
        _t(p[f"{name}.gamma"]) * _t(p[f"{name}.inv_std"])
    ).view(shape) + _t(p[f"{name}.beta"]).view(shape)


def _torch_encoder(p, x_nchw):
    lrelu = lambda t: F.leaky_relu(t, 0.2)
    h = lrelu(F.conv2d(x_nchw, _t(p["enc_conv1.W"]), _t(p["enc_conv1.b"]), stride=2, padding=2))
    h = lrelu(_bn_eval(p, "bnorm2", F.conv2d(h, _t(p["enc_conv2.W"]), stride=2, padding=2)))
    h = lrelu(_bn_eval(p, "bnorm3", F.conv2d(h, _t(p["enc_conv3.W"]), stride=2, padding=2)))
    c4 = lrelu(_bn_eval(p, "bnorm4", F.conv2d(h, _t(p["enc_conv4.W"]), stride=2, padding=2)))
    f = F.elu(_bn_eval(p, "bnorm_enc_fc1", c4.reshape(c4.shape[0], -1) @ _t(p["enc_fc1.W"])))
    mu = _bn_eval(p, "mu_bnorm", f @ _t(p["enc_mu.W"]))
    return mu, c4


def _torch_decoder(p, z):
    y = F.relu(_bn_eval(p, "bnorm_dec_fc2", z @ _t(p["l_dec_fc2.W"])))
    h = y.reshape(y.shape[0], 1024, 4, 4)
    for conv, bname in (("dec_conv1", "bnorm_dc1"), ("dec_conv2", "bnorm_dc2"), ("dec_conv3", "bnorm_dc3")):
        h = F.conv_transpose2d(h, _t(p[f"{conv}.W"]), stride=2, padding=2, output_padding=1)
        h = F.relu(_bn_eval(p, bname, h))
    return torch.tanh(
        F.conv_transpose2d(h, _t(p["dec_out.W"]), stride=2, padding=2, output_padding=1)
    )


def _torch_discrim(p, c4):
    x = c4.mean(dim=(2, 3))  # GlobalPool
    theta = _t(p["minibatch_discrim.theta"])
    w = theta * (
        torch.exp(_t(p["minibatch_discrim.log_weight_scale"])) / torch.sqrt((theta**2).sum(0))
    ).unsqueeze(0)
    act = torch.tensordot(x, w, dims=([1], [0]))  # (N, K, D)
    dif = (act.unsqueeze(3) - act.permute(1, 2, 0).unsqueeze(0)).abs().sum(2)  # (N, K, N)
    n = x.shape[0]
    dif = dif + 1e6 * torch.eye(n).unsqueeze(1)
    f = torch.exp(-dif).sum(2) + _t(p["minibatch_discrim.b"])
    return torch.cat([x, f], dim=1) @ _t(p["discrimi.W"])


# --- full-IAN / IANv1 replica pieces ------------------------------------------


def _mdcl_params(p, rng, name, ni, nf, scales):
    """Reference MDCL params (`layers.py:207-258`): shared (O,I,3,3) filter +
    per-branch per-output-channel coefficients."""
    p[f"{name}W"] = rng.randn(nf, ni, 3, 3).astype(np.float32) * 0.05
    c0 = 1.0 / (1 + len(scales))
    p[f"{name}_coeff_base"] = (c0 + 0.02 * rng.randn(nf)).astype(np.float32)
    for s in scales:
        suffix = "1x1" if s == 0 else str(s)
        p[f"{name}_coeff_{suffix}"] = (c0 + 0.02 * rng.randn(nf)).astype(np.float32)


def _torch_mdcl(p, name, x, scales):
    """Reference MDCL forward: undilated 3x3 * coeff_base + (scale==0: 1x1 of
    filter means * coeff_1x1) + (scale s: dilation-s 3x3 * coeff_s), summed."""
    W = _t(p[f"{name}W"])
    out = F.conv2d(x, W * _t(p[f"{name}_coeff_base"]).view(-1, 1, 1, 1), padding=1)
    for s in scales:
        if s == 0:
            c = _t(p[f"{name}_coeff_1x1"]).view(-1, 1, 1, 1)
            out = out + F.conv2d(x, W.mean(dim=(2, 3), keepdim=True) * c)
        else:
            c = _t(p[f"{name}_coeff_{s}"]).view(-1, 1, 1, 1)
            out = out + F.conv2d(x, W * c, padding=s, dilation=s)
    return out


def _torch_mdblock(p, name, x, scales):
    """MDBLOCK (`layers.py:411-416`): NL(BN2(x + MDCL2(NL(BN1(MDCL1(NL(BN0(x))))))))."""
    lrelu = lambda t: F.leaky_relu(t, 0.2)
    h = lrelu(_bn_eval(p, f"{name}bnorm0", x))
    h = _torch_mdcl(p, name, h, scales)
    h = lrelu(_bn_eval(p, f"{name}bnorm1", h))
    h = _torch_mdcl(p, f"{name}2", h, scales)
    return lrelu(_bn_eval(p, f"{name}bnorm2", x + h))


def _torch_rgb_beta_head(p, h):
    """Autoregressive RGB-Beta head (`IAN.py:183-207`) + beta_layer
    (`layers.py:397-408`): 2*alpha/(alpha+beta+1e-8)-1."""
    S = [2, 3, 4]
    R = torch.sigmoid(_torch_mdcl(p, "R", h, S))
    G = torch.sigmoid(_torch_mdcl(p, "G_a", h, S) + _torch_mdcl(p, "G_b", R, S))
    B = torch.sigmoid(
        _torch_mdcl(p, "B_a", h, S) + _torch_mdcl(p, "B_b", torch.cat([R, G], 1), S)
    )
    beta = lambda a, b: 2 * (a / (a + b + 1e-8)) - 1
    return torch.cat(
        [beta(c[:, 0:1], c[:, 1:2]) for c in (R, G, B)], dim=1
    )


def _made_params(p, rng, name, d):
    """Reference MADE weights (`layers.py:767-803`): masked input layer,
    masked output, direct-input (DIML) skip; Lasagne dense (in, out)."""
    p[f"{name}_input.W"] = rng.randn(d, d).astype(np.float32) * 0.1
    p[f"{name}_input.b"] = rng.randn(d).astype(np.float32) * 0.05
    p[f"{name}_output_W.W"] = rng.randn(d, d).astype(np.float32) * 0.1
    p[f"{name}_output_W.b"] = rng.randn(d).astype(np.float32) * 0.05
    p[f"{name}_output_D.W"] = rng.randn(d, d).astype(np.float32) * 0.1
    p[f"{name}_output_D.b"] = rng.randn(d).astype(np.float32) * 0.05


def _torch_made(p, masks, name, z):
    layer_masks, direct = masks
    h = F.relu(z @ (_t(p[f"{name}_input.W"]) * _t(layer_masks[0])) + _t(p[f"{name}_input.b"]))
    out = h @ (_t(p[f"{name}_output_W.W"]) * _t(layer_masks[1])) + _t(p[f"{name}_output_W.b"])
    d = z @ (_t(p[f"{name}_output_D.W"]) * _t(direct)) + _t(p[f"{name}_output_D.b"])
    return out + d


def _torch_iaf(p, masks, z):
    """IAFLayer (`layers.py:641-650`): (z - mu) / exp(logsigma)."""
    mu = _torch_made(p, masks, "l_IAF_mu", z)
    ls = _torch_made(p, masks, "l_IAF_ls", z)
    return (z - mu) / torch.exp(ls)


def _encoder_params(p, rng, bn):
    p["enc_conv1.W"] = rng.randn(128, 3, 5, 5).astype(np.float32) * 0.02
    p["enc_conv1.b"] = rng.randn(128).astype(np.float32) * 0.02
    p["enc_conv2.W"] = rng.randn(256, 128, 5, 5).astype(np.float32) * 0.02
    bn("bnorm2", 256)
    p["enc_conv3.W"] = rng.randn(512, 256, 5, 5).astype(np.float32) * 0.02
    bn("bnorm3", 512)
    p["enc_conv4.W"] = rng.randn(1024, 512, 5, 5).astype(np.float32) * 0.02
    bn("bnorm4", 1024)
    p["enc_fc1.W"] = rng.randn(1024 * 16, 1000).astype(np.float32) * 0.02
    bn("bnorm_enc_fc1", 1000)
    p["enc_mu.W"] = rng.randn(1000, 100).astype(np.float32) * 0.02
    bn("mu_bnorm", 100)
    p["enc_logsigma.W"] = rng.randn(1000, 100).astype(np.float32) * 0.02
    bn("ls_bnorm", 100)


def _discrim_params(p, rng, n_units, w_std):
    p["minibatch_discrim.theta"] = rng.randn(1024, 500, 5).astype(np.float32) * 0.05
    p["minibatch_discrim.log_weight_scale"] = rng.randn(500, 5).astype(np.float32) * 0.1
    p["minibatch_discrim.b"] = np.full(500, -1.0, np.float32)
    p["discrimi.W"] = rng.randn(1024 + 500, n_units).astype(np.float32) * w_std


def _bn_maker(p, rng):
    def bn(name, c):
        p[f"{name}.beta"] = rng.randn(c).astype(np.float32) * 0.1
        p[f"{name}.gamma"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        p[f"{name}.mean"] = rng.randn(c).astype(np.float32) * 0.1
        p[f"{name}.inv_std"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    return bn


def _torch_encoder_fc_relu(p, x_nchw):
    """IAN/IANv1 encoder: identical tower, but enc_fc1 uses relu
    (`IAN.py:121`, `IANv1.py:114`) where IAN_simple uses elu."""
    lrelu = lambda t: F.leaky_relu(t, 0.2)
    h = lrelu(F.conv2d(x_nchw, _t(p["enc_conv1.W"]), _t(p["enc_conv1.b"]), stride=2, padding=2))
    h = lrelu(_bn_eval(p, "bnorm2", F.conv2d(h, _t(p["enc_conv2.W"]), stride=2, padding=2)))
    h = lrelu(_bn_eval(p, "bnorm3", F.conv2d(h, _t(p["enc_conv3.W"]), stride=2, padding=2)))
    c4 = lrelu(_bn_eval(p, "bnorm4", F.conv2d(h, _t(p["enc_conv4.W"]), stride=2, padding=2)))
    f = F.relu(_bn_eval(p, "bnorm_enc_fc1", c4.reshape(c4.shape[0], -1) @ _t(p["enc_fc1.W"])))
    mu = _bn_eval(p, "mu_bnorm", f @ _t(p["enc_mu.W"]))
    return mu, c4


def _reference_ian_checkpoint(rng):
    """Random full-IAN weights in the REFERENCE layout (`IAN.py:67-228`)."""
    p = {}
    bn = _bn_maker(p, rng)
    _encoder_params(p, rng, bn)
    _made_params(p, rng, "l_IAF_mu", 100)
    _made_params(p, rng, "l_IAF_ls", 100)
    p["l_dec_fc2.W"] = rng.randn(100, 512 * 16).astype(np.float32) * 0.02
    p["l_dec_fc2.b"] = rng.randn(512 * 16).astype(np.float32) * 0.02
    for name, ci, co in (("dec_conv1", 512, 512), ("dec_conv2", 512, 256), ("dec_conv3", 256, 128)):
        p[f"{name}.W"] = rng.randn(ci, co, 5, 5).astype(np.float32) * 0.02
        p[f"{name}.b"] = rng.randn(co).astype(np.float32) * 0.02
    _mdcl_params(p, rng, "dec_conv2a", 512, 512, [0, 2])
    _mdcl_params(p, rng, "dec_conv2a2", 512, 512, [0, 2])
    for b in ("dec_conv2abnorm0", "dec_conv2abnorm1", "dec_conv2abnorm2"):
        bn(b, 512)
    _mdcl_params(p, rng, "dec_conv3a", 256, 256, [0, 2, 3])
    _mdcl_params(p, rng, "dec_conv3a2", 256, 256, [0, 2, 3])
    for b in ("dec_conv3abnorm0", "dec_conv3abnorm1", "dec_conv3abnorm2"):
        bn(b, 256)
    _mdcl_params(p, rng, "dec_conv4a", 128, 128, [0, 2, 3])
    _mdcl_params(p, rng, "dec_conv4a2", 128, 128, [0, 2, 3])
    for b in ("dec_conv4abnorm0", "dec_conv4abnorm1", "dec_conv4abnorm2"):
        bn(b, 128)
    p["dec_conv4.W"] = rng.randn(128, 128, 5, 5).astype(np.float32) * 0.02
    bn("bnorm_dc4", 128)
    _mdcl_params(p, rng, "R", 128, 2, [2, 3, 4])
    _mdcl_params(p, rng, "G_a", 128, 2, [2, 3, 4])
    _mdcl_params(p, rng, "G_b", 2, 2, [2, 3, 4])
    _mdcl_params(p, rng, "B_a", 128, 2, [2, 3, 4])
    _mdcl_params(p, rng, "B_b", 4, 2, [2, 3, 4])
    _discrim_params(p, rng, 3, 0.02)
    return p


def _torch_ian_decoder(p, z):
    lrelu = lambda t: F.leaky_relu(t, 0.2)
    y = lrelu(z @ _t(p["l_dec_fc2.W"]) + _t(p["l_dec_fc2.b"]))
    h = y.reshape(y.shape[0], 512, 4, 4)
    h = F.conv_transpose2d(
        h, _t(p["dec_conv1.W"]), _t(p["dec_conv1.b"]), stride=2, padding=2, output_padding=1
    )
    h = _torch_mdblock(p, "dec_conv2a", h, [0, 2])
    h = F.conv_transpose2d(
        h, _t(p["dec_conv2.W"]), _t(p["dec_conv2.b"]), stride=2, padding=2, output_padding=1
    )
    h = _torch_mdblock(p, "dec_conv3a", h, [0, 2, 3])
    h = F.conv_transpose2d(
        h, _t(p["dec_conv3.W"]), _t(p["dec_conv3.b"]), stride=2, padding=2, output_padding=1
    )
    h = _torch_mdblock(p, "dec_conv4a", h, [0, 2, 3])
    h = lrelu(
        _bn_eval(
            p, "bnorm_dc4", F.conv_transpose2d(h, _t(p["dec_conv4.W"]), stride=2, padding=2, output_padding=1)
        )
    )
    return _torch_rgb_beta_head(p, h)


def _reference_ianv1_checkpoint(rng):
    """Random IANv1 weights in the REFERENCE layout (`IANv1.py:63-222`)."""
    p = {}
    bn = _bn_maker(p, rng)
    _encoder_params(p, rng, bn)
    _made_params(p, rng, "l_IAF_mu", 100)
    _made_params(p, rng, "l_IAF_ls", 100)
    p["l_dec_fc2.W"] = rng.randn(100, 1024 * 16).astype(np.float32) * 0.02
    p["l_dec_fc2.b"] = rng.randn(1024 * 16).astype(np.float32) * 0.02
    for name, ci, co in (
        ("dec_conv1", 1024, 512),
        ("dec_conv2", 512, 256),
        ("dec_conv3", 256, 128),
        ("dec_conv4", 128, 64),
    ):
        p[f"{name}.W"] = rng.randn(ci, co, 5, 5).astype(np.float32) * 0.02
        bn(f"bnorm_dc{name[-1]}", co)
    for head, ni in (("R", 64), ("G_a", 64), ("G_b", 2), ("B_a", 64), ("B_b", 4)):
        _mdcl_params(p, rng, head, ni, 2, [2, 3, 4])
    _discrim_params(p, rng, 1, 0.01)
    return p


def _torch_ianv1_decoder(p, z):
    y = z @ _t(p["l_dec_fc2.W"]) + _t(p["l_dec_fc2.b"])  # linear (`IANv1.py:128`)
    h = y.reshape(y.shape[0], 1024, 4, 4)
    for i in (1, 2, 3, 4):
        h = F.conv_transpose2d(h, _t(p[f"dec_conv{i}.W"]), stride=2, padding=2, output_padding=1)
        h = F.relu(_bn_eval(p, f"bnorm_dc{i}", h))
    return _torch_rgb_beta_head(p, h)


def _convert_roundtrip(ref, metadata, module, tmp_path):
    """Save a REFERENCE-style npz (pickled metadata under 'metadata',
    `GANcheckpoints.py:19`), convert with the CLI-backing function, load into
    an init'd model -- the full interop path a reference user would take."""
    import pickle

    from npe_tpu.utils import checkpoints
    from npe_tpu.utils.convert import convert_theano_npz

    src = str(tmp_path / "theano.npz")
    np.savez_compressed(src, **ref, metadata=np.asarray(pickle.dumps(metadata)))
    dst = str(tmp_path / "converted.npz")
    convert_theano_npz(src, dst)
    import jax

    v = module.init(jax.random.PRNGKey(0))
    meta = checkpoints.load_weights(dst, v)
    return {k: jnp.asarray(a) for k, a in v.items()}, meta


def _check_iaf_model(module, ref, make_decoder, tmp_path, n_discrim):
    """Shared golden body for IAN / IANv1: encoder (relu fc1), MADE/IAF,
    decoder, RGB-Beta head, discriminator -- torch replica vs converted."""
    from npe_tpu.ops.made import made_masks

    rng = np.random.RandomState(3)
    # a NON-default ordering proves masks come from the metadata round-trip,
    # not from init defaults
    ordering = rng.permutation(100).tolist()
    masks = made_masks(100, [100], ordering=ordering)
    metadata = {"epoch": 9, "made_orderings": {"l_IAF_mu": ordering, "l_IAF_ls": ordering}}

    v, meta = _convert_roundtrip(ref, metadata, module, tmp_path)
    assert meta.get("epoch") == 9
    np.testing.assert_array_equal(
        np.asarray(v["l_IAF_mu_output_D.weights_mask"]), masks[1]
    )

    x_nchw = (rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1) * 0.9
    with torch.no_grad():
        mu_ref, c4_ref = _torch_encoder_fc_relu(ref, _t(x_nchw))
        z_ref = _torch_iaf(ref, masks, mu_ref)
        img_ref = make_decoder(ref, z_ref)
        logits_ref = _torch_discrim(ref, c4_ref)

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    z = module.encode(v, x_nhwc)  # deterministic: mu -> IAF
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=2e-3, atol=2e-4)

    img = module.decode(v, z)
    np.testing.assert_allclose(
        np.asarray(img).transpose(0, 3, 1, 2), img_ref.numpy(), rtol=2e-3, atol=2e-3
    )

    c4 = common.apply_backbone(v, x_nhwc, False, None)[-1]
    logits = common.apply_discrim_head(v, c4)
    assert logits.shape == (2, n_discrim)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), rtol=2e-3, atol=2e-4)


def test_full_ian_converter_parity(tmp_path):
    """Full IAN (`IAN.py`): MDCL coefficient tensors, MDBLOCK decoder,
    RGB-Beta head, MADE/IAF with metadata-restored masks, ternary head."""
    ref = _reference_ian_checkpoint(np.random.RandomState(11))
    _check_iaf_model(get_config("IAN"), ref, _torch_ian_decoder, tmp_path, 3)


def test_ianv1_converter_parity(tmp_path):
    """IANv1 (`IANv1.py`): plain deconv decoder, RGB-Beta head, MADE/IAF,
    binary head."""
    ref = _reference_ianv1_checkpoint(np.random.RandomState(13))
    _check_iaf_model(get_config("IANv1"), ref, _torch_ianv1_decoder, tmp_path, 1)


def test_full_model_converter_parity():
    rng = np.random.RandomState(7)
    ref = _reference_checkpoint(rng)
    x_nchw = (rng.rand(4, 3, 64, 64).astype(np.float32) * 2 - 1) * 0.9

    with torch.no_grad():
        mu_ref, c4_ref = _torch_encoder(ref, _t(x_nchw))
        img_ref = _torch_decoder(ref, mu_ref)
        logits_ref = _torch_discrim(ref, c4_ref)

    v = {k: jnp.asarray(convert_param(k, a)) for k, a in ref.items()}
    module = get_config("IAN_simple")
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))

    mu = module.encode(v, x_nhwc)
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(), rtol=1e-3, atol=1e-4)

    img = module.decode(v, mu)
    np.testing.assert_allclose(
        np.asarray(img).transpose(0, 3, 1, 2), img_ref.numpy(), rtol=1e-3, atol=1e-4
    )

    c4 = common.apply_backbone(v, x_nhwc, False, None)[-1]
    logits = common.apply_discrim_head(v, c4)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), rtol=1e-3, atol=1e-4)
