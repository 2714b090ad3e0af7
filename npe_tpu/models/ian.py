"""IAN: the full Introspective Adversarial Network (reference `IAN.py`).

Latent path: GaussianSample -> 2x MADE(100) -> IAF (`IAN.py:126-128`).
Decoder: FC 512*16 -> (4,4,512) -> Deconv512 + MDBLOCK interleaved with
Deconvs 256/128/128 (`IAN.py:129-181`).
Output head: autoregressive RGB-Beta -- R from features; G from features+R;
B from features+[R,G]; each a sigmoid 2-channel MDCL pair -> beta mean per
channel (`IAN.py:183-207`).
Discriminator: 3-way softmax for the ternary real/recon/sample loss
(`IAN.py:210-216`).
"""

import jax.numpy as jnp

from npe_tpu.models import common
from npe_tpu.models.common import mdcl_multi, LRELU, VarBuilder, bn, mdblock, mdcl, unflatten_nchw
from npe_tpu.ops.activations import relu, sigmoid
from npe_tpu.ops.beta import beta_mean
from npe_tpu.ops.conv import deconv2d_phased as deconv2d
from npe_tpu.ops.linear import dense
from npe_tpu.ops.made import iaf_transform, made_apply, made_init
from npe_tpu.ops.sampling import gaussian_sample

lr_schedule = {0: 0.0002, 25: 0.0001, 50: 0.00005, 75: 0.00001}
# Hyperparameters per reference `IAN.py:38-62`.
cfg = {
    "model": "IAN",
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
    "max_epochs": 80,
    "checkpoint_every_nth": 1,
    "num_latents": 100,
    "recon_weight": 3.0,
    "feature_weight": 1.0,
    "dg_weight": 1.0,
    "dd_weight": 1.0,
    "agr_weight": 1.0,
    "ags_weight": 1.0,
    "n_shuffles": 1,
    "ortho": 1e-3,
}

NUM_LATENTS = cfg["num_latents"]
N_DISCRIM_CLASSES = 3  # ternary softmax discriminator (`IAN.py:210-216`)
HAS_IAF = True
MADE_HIDDEN = [NUM_LATENTS]


def init(key):
    vb = VarBuilder(key)
    common.init_encoder(vb, NUM_LATENTS)
    # IAF MADE nets (masks are deterministic state; see ops/made.py).
    vb.v.update(made_init(vb.key(), "l_IAF_mu", NUM_LATENTS, MADE_HIDDEN, n_shuffles=cfg["n_shuffles"]))
    vb.v.update(made_init(vb.key(), "l_IAF_ls", NUM_LATENTS, MADE_HIDDEN, n_shuffles=cfg["n_shuffles"]))
    vb.dense("l_dec_fc2", NUM_LATENTS, 512 * 16, bias=True)
    vb.deconv("dec_conv1", 512, 512, bias=True)
    _mdblock_init(vb, "dec_conv2a", 512, [0, 2])
    vb.deconv("dec_conv2", 512, 256, bias=True)
    _mdblock_init(vb, "dec_conv3a", 256, [0, 2, 3])
    vb.deconv("dec_conv3", 256, 128, bias=True)
    _mdblock_init(vb, "dec_conv4a", 128, [0, 2, 3])
    vb.deconv("dec_conv4", 128, 128, bias=False)
    vb.bn("bnorm_dc4", 128)
    # RGB-Beta head MDCLs (`IAN.py:183-206`).
    vb.mdcl("R", 128, 2, [2, 3, 4])
    vb.mdcl("G_a", 128, 2, [2, 3, 4])
    vb.mdcl("G_b", 2, 2, [2, 3, 4])
    vb.mdcl("B_a", 128, 2, [2, 3, 4])
    vb.mdcl("B_b", 4, 2, [2, 3, 4])
    common.init_discrim(vb, N_DISCRIM_CLASSES, w_std=0.02)
    return vb.v


def _mdblock_init(vb, name, nf, scales):
    vb.mdcl(name, nf, nf, scales)
    vb.mdcl(f"{name}2", nf, nf, scales)
    vb.bn(f"{name}bnorm0", nf)
    vb.bn(f"{name}bnorm1", nf)
    vb.bn(f"{name}bnorm2", nf)


backbone = common.apply_backbone
discrim_logits = common.apply_discrim_head


def encode_stats(v, x, train=False, upd=None):
    feats = common.apply_backbone(v, x, train, upd)
    # enc_fc1 uses relu in this config (`IAN.py:121` / `IANv1.py:114`),
    # unlike IAN_simple's elu.
    mu, ls = common.apply_latent_heads(v, feats[-1], train, upd, act=relu)
    return mu, ls, feats


def iaf(v, z):
    """z (pre-IAF) -> (z', iaf_mu, iaf_logsigma), `IAN.py:127-128`."""
    mu = made_apply(v, "l_IAF_mu", z, n_hidden=len(MADE_HIDDEN))
    ls = made_apply(v, "l_IAF_ls", z, n_hidden=len(MADE_HIDDEN))
    return iaf_transform(z, mu, ls), mu, ls


def encode_pre_iaf(v, x):
    """Deterministic encode to the pre-IAF latent (training `Zfn`,
    `train_IAN.py:286`)."""
    mu, _, _ = encode_stats(v, x)
    return mu


def encode(v, x):
    """Deterministic encode to the decoder-input (post-IAF) latent (plat
    `encode_images`, reference `API.py:50-51` reads l_Z = IAF output)."""
    z, _, _ = iaf(v, encode_pre_iaf(v, x))
    return z


def rgb_beta_head(v, h, mode=None):
    """Autoregressive RGB-Beta output (`IAN.py:183-207`); shared packed
    implementation in models/common.py."""
    return common.rgb_beta_head(v, h, scales=(2, 3, 4), mode=mode)


def decode(v, z, train=False, upd=None):
    """Decoder-input (post-IAF) latent -> image in [-1, 1]."""
    y = LRELU(dense(z, v["l_dec_fc2.W"], v["l_dec_fc2.b"]))
    h = unflatten_nchw(y, 512, 4, 4)
    h = deconv2d(h, v["dec_conv1.W"], b=v["dec_conv1.b"])
    h = mdblock(v, upd, "dec_conv2a", h, [0, 2], LRELU, train)
    h = deconv2d(h, v["dec_conv2.W"], b=v["dec_conv2.b"])
    h = mdblock(v, upd, "dec_conv3a", h, [0, 2, 3], LRELU, train)
    h = deconv2d(h, v["dec_conv3.W"], b=v["dec_conv3.b"])
    h = mdblock(v, upd, "dec_conv4a", h, [0, 2, 3], LRELU, train)
    # NOTE: a fused tail (block deconv4 in 2x2-packed layout -> tiled BN
    # affine -> one regroup permute -> pre-packed head, skipping the d2s+s2d
    # round trip) was built and measured SLOWER on v5e (13.8k vs 15.8k
    # imgs/s at b256): the lhs-dilated deconv4 beats the block form by more
    # than the saved relayouts. Kept the simple formulation.
    h = LRELU(bn(v, upd, "bnorm_dc4", deconv2d(h, v["dec_conv4.W"]), train))
    return rgb_beta_head(v, h)


def decode_pre_iaf(v, z, train=False, upd=None):
    """Pre-IAF latent -> image (training `sample` fn, `train_IAN.py:283`)."""
    z2, _, _ = iaf(v, z)
    return decode(v, z2, train, upd)


def sample_latent(mu, ls, rng):
    return gaussian_sample(mu, ls, rng)
