"""IANv1: the v1 full IAN (reference `IANv1.py`).

Same IAF/MADE latent path as IAN, but a plain 4-deconv decoder (no MDBLOCKs),
the same autoregressive RGB-Beta head, and a BINARY sigmoid discriminator
(`IANv1.py:122-209`).
"""

import jax.numpy as jnp

from npe_tpu.models import common
from npe_tpu.models.common import mdcl_multi, VarBuilder, bn, mdcl, unflatten_nchw
from npe_tpu.ops.activations import relu, sigmoid
from npe_tpu.ops.beta import beta_mean
from npe_tpu.ops.conv import deconv2d_phased as deconv2d
from npe_tpu.ops.linear import dense
from npe_tpu.ops.made import iaf_transform, made_apply, made_init
from npe_tpu.ops.sampling import gaussian_sample

lr_schedule = {0: 0.0002, 25: 0.0001, 50: 0.00005, 75: 0.00001}
# Hyperparameters per reference `IANv1.py:38-61` (lr drops at 25/50/75,
# same schedule as IAN's, `IANv1.py:38`).
cfg = {
    "model": "IANv1",
    "batch_size": 16,
    "learning_rate": lr_schedule,
    "optimizer": "Adam",
    "beta1": 0.5,
    "update_ratio": 1,
    "decay_rate": 0,
    "reg": 1e-5,
    "momentum": 0.9,
    "shuffle": True,
    "dims": (64, 64),
    "n_channels": 3,
    "batches_per_chunk": 64,
    "max_epochs": 150,
    "checkpoint_every_nth": 1,
    "num_latents": 100,
    "recon_weight": 3.0,
    "feature_weight": 1.0,
    "dg_weight": 1.0,
    "dd_weight": 1.0,
    "agr_weight": 1.0,
    "ags_weight": 1.0,
    "n_shuffles": 1,
}

NUM_LATENTS = cfg["num_latents"]
N_DISCRIM_CLASSES = 1  # binary sigmoid (`IANv1.py:203-209`)
HAS_IAF = True
MADE_HIDDEN = [NUM_LATENTS]


def init(key):
    vb = VarBuilder(key)
    common.init_encoder(vb, NUM_LATENTS)
    vb.v.update(made_init(vb.key(), "l_IAF_mu", NUM_LATENTS, MADE_HIDDEN, n_shuffles=cfg["n_shuffles"]))
    vb.v.update(made_init(vb.key(), "l_IAF_ls", NUM_LATENTS, MADE_HIDDEN, n_shuffles=cfg["n_shuffles"]))
    vb.dense("l_dec_fc2", NUM_LATENTS, 1024 * 16, bias=True)
    vb.deconv("dec_conv1", 1024, 512, bias=False)
    vb.bn("bnorm_dc1", 512)
    vb.deconv("dec_conv2", 512, 256, bias=False)
    vb.bn("bnorm_dc2", 256)
    vb.deconv("dec_conv3", 256, 128, bias=False)
    vb.bn("bnorm_dc3", 128)
    vb.deconv("dec_conv4", 128, 64, bias=False)
    vb.bn("bnorm_dc4", 64)
    vb.mdcl("R", 64, 2, [2, 3, 4])
    vb.mdcl("G_a", 64, 2, [2, 3, 4])
    vb.mdcl("G_b", 2, 2, [2, 3, 4])
    vb.mdcl("B_a", 64, 2, [2, 3, 4])
    vb.mdcl("B_b", 4, 2, [2, 3, 4])
    common.init_discrim(vb, N_DISCRIM_CLASSES, w_std=0.01)
    return vb.v


backbone = common.apply_backbone
discrim_logits = common.apply_discrim_head


def encode_stats(v, x, train=False, upd=None):
    feats = common.apply_backbone(v, x, train, upd)
    # enc_fc1 uses relu in this config (`IAN.py:121` / `IANv1.py:114`),
    # unlike IAN_simple's elu.
    mu, ls = common.apply_latent_heads(v, feats[-1], train, upd, act=relu)
    return mu, ls, feats


def iaf(v, z):
    mu = made_apply(v, "l_IAF_mu", z, n_hidden=len(MADE_HIDDEN))
    ls = made_apply(v, "l_IAF_ls", z, n_hidden=len(MADE_HIDDEN))
    return iaf_transform(z, mu, ls), mu, ls


def encode_pre_iaf(v, x):
    mu, _, _ = encode_stats(v, x)
    return mu


def encode(v, x):
    z, _, _ = iaf(v, encode_pre_iaf(v, x))
    return z


def rgb_beta_head(v, h, mode=None):
    """Autoregressive RGB-Beta output (`IAN.py:183-207`); shared packed
    implementation in models/common.py."""
    return common.rgb_beta_head(v, h, scales=(2, 3, 4), mode=mode)


def decode(v, z, train=False, upd=None):
    y = dense(z, v["l_dec_fc2.W"], v["l_dec_fc2.b"])  # linear (`IANv1.py:128`)
    h = unflatten_nchw(y, 1024, 4, 4)
    h = relu(bn(v, upd, "bnorm_dc1", deconv2d(h, v["dec_conv1.W"]), train))
    h = relu(bn(v, upd, "bnorm_dc2", deconv2d(h, v["dec_conv2.W"]), train))
    h = relu(bn(v, upd, "bnorm_dc3", deconv2d(h, v["dec_conv3.W"]), train))
    h = relu(bn(v, upd, "bnorm_dc4", deconv2d(h, v["dec_conv4.W"]), train))
    return rgb_beta_head(v, h)


def decode_pre_iaf(v, z, train=False, upd=None):
    z2, _, _ = iaf(v, z)
    return decode(v, z2, train, upd)


def sample_latent(mu, ls, rng):
    return gaussian_sample(mu, ls, rng)
