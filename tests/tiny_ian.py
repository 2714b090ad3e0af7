"""Tiny IAN_simple-shaped test profile (user config module, loaded by path
through `npe_tpu.models.get_config`).

Same layer NAMES, partitions, and code paths as `models/ian_simple.py`
(reference `IAN_simple.py:56-241`) at 1/8 width -- the shared apply
functions read shapes from the weights, so the multihost / converter slow
tests exercise identical machinery at a fraction of the 1-core compile and
execute cost (VERDICT r2 weak #8)."""

import jax.numpy as jnp

from npe_tpu.models import common
from npe_tpu.models.common import VarBuilder, bn, unflatten_nchw
from npe_tpu.ops.activations import relu
from npe_tpu.ops.conv import deconv2d_phased as deconv2d
from npe_tpu.ops.linear import dense
from npe_tpu.ops.sampling import gaussian_sample

cfg = {
    "model": "tiny_ian",
    "batch_size": 8,
    "learning_rate": 0.0002,
    "optimizer": "Adam",
    "beta1": 0.5,
    "update_ratio": 1,
    "decay_rate": 0,
    "reg": 1e-5,
    "momentum": 0.9,
    "shuffle": True,
    "dims": (64, 64),
    "n_channels": 3,
    "batches_per_chunk": 2,
    "max_epochs": 2,
    "checkpoint_every_nth": 1,
    "num_latents": 16,
    "recon_weight": 3.0,
    "feature_weight": 1.0,
    "dg_weight": 1.0,
    "dd_weight": 1.0,
    "agr_weight": 1.0,
    "ags_weight": 1.0,
}

NUM_LATENTS = cfg["num_latents"]
N_DISCRIM_CLASSES = 1
HAS_IAF = False
WIDTHS = (16, 32, 64, 128)
FC = 64


def init(key):
    vb = VarBuilder(key)
    common.init_encoder(vb, NUM_LATENTS, widths=WIDTHS, fc=FC)
    vb.dense("l_dec_fc2", NUM_LATENTS, WIDTHS[3] * 16, bias=False)
    vb.bn("bnorm_dec_fc2", WIDTHS[3] * 16)
    vb.deconv("dec_conv1", WIDTHS[3], WIDTHS[2], bias=False)
    vb.bn("bnorm_dc1", WIDTHS[2])
    vb.deconv("dec_conv2", WIDTHS[2], WIDTHS[1], bias=False)
    vb.bn("bnorm_dc2", WIDTHS[1])
    vb.deconv("dec_conv3", WIDTHS[1], WIDTHS[0], bias=False)
    vb.bn("bnorm_dc3", WIDTHS[0])
    vb.deconv("dec_out", WIDTHS[0], 3, bias=False)
    common.init_discrim(vb, N_DISCRIM_CLASSES, w_std=0.01, feat=WIDTHS[3], n_kernels=32)
    return vb.v


backbone = common.apply_backbone
discrim_logits = common.apply_discrim_head


def encode_stats(v, x, train=False, upd=None):
    feats = common.apply_backbone(v, x, train, upd)
    mu, ls = common.apply_latent_heads(v, feats[-1], train, upd)
    return mu, ls, feats


def encode(v, x):
    mu, _, _ = encode_stats(v, x)
    return mu


encode_pre_iaf = encode


def iaf(v, z):
    zero = jnp.zeros_like(z)
    return z, zero, zero


def decode(v, z, train=False, upd=None):
    y = relu(bn(v, upd, "bnorm_dec_fc2", dense(z, v["l_dec_fc2.W"]), train))
    h = unflatten_nchw(y, WIDTHS[3], 4, 4)
    h = relu(bn(v, upd, "bnorm_dc1", deconv2d(h, v["dec_conv1.W"]), train))
    h = relu(bn(v, upd, "bnorm_dc2", deconv2d(h, v["dec_conv2.W"]), train))
    h = relu(bn(v, upd, "bnorm_dc3", deconv2d(h, v["dec_conv3.W"]), train))
    return jnp.tanh(deconv2d(h, v["dec_out.W"]))


decode_pre_iaf = decode


def sample_latent(mu, ls, rng):
    return gaussian_sample(mu, ls, rng)
