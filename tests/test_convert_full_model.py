"""End-to-end converter golden: a COMPLETE reference-layout IAN_simple
checkpoint (every Lasagne-named param, OIHW / (cin,cout,kh,kw) / NCHW-flatten
layouts) is ported through utils/convert.py and must produce the SAME
encoder, decoder, and discriminator activations as a torch NCHW replica of
the reference graph (`IAN_simple.py:56-241`, `GANcheckpoints.py:11-57`).

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
