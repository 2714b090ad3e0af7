"""The IAN training graph: forward passes + per-partition gradients
(reference `make_training_functions`, `train_IAN.py:47-352`), as pure
functions of (partitioned params, state, batch, rng).

Three forward passes per step, like the reference (`train_IAN.py:116-149`):
  pass 1: X      -> recon X_hat, latent stats, D(X), introspect g(X)
  pass 2: X_hat  -> D(X_hat), introspect g(X_hat)
  pass 3: decode(Z_rand) -> D(X_gen)

BN runs in batch-stats mode on all passes (the reference never passes
deterministic=True in training); running-stat updates are taken from the
real-X pass (the reference's default_update aliasing made this ambiguous
across its three passes -- we pin it to the real-data statistics).
"""

import jax
import jax.numpy as jnp

from npe_tpu.training import losses as L


def _f32_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if jnp.issubdtype(a.dtype, jnp.floating) else a, tree
    )


def to_compute(variables, x, z_rand, cfg):
    """Mixed-precision entry: with cfg['compute_dtype'] set (e.g. 'bfloat16'),
    cast trainable params and the batch to the compute dtype for the
    forward/backward while the MASTER copies stay float32 -- gradients flow
    back through the casts as float32 (the astype VJP casts the cotangent to
    the primal dtype), so the Adam update is full-precision. Non-trainable
    state (BN running mean/inv_std, masks) stays f32: batch_norm_apply
    computes its statistics in the stats dtype (ops/norm.py).

    Replaces the reference's f32-only Theano hot loop
    (`train_IAN.py:283-325`) with the MXU-native regime."""
    cd = cfg.get("compute_dtype")
    if not cd:
        return variables, x, z_rand
    from npe_tpu.models.common import is_trainable

    dt = jnp.dtype(cd)
    cast = {
        k: v.astype(dt)
        for k, v in variables.items()
        if is_trainable(k) and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
    }
    return {**variables, **cast}, x.astype(dt), z_rand.astype(dt)


def forward_all(module, variables, x, z_rand, rng, upd=None):
    """Full three-pass training forward. x: (B, 64, 64, 3) in [-1, 1]."""
    mu, ls, g_x = module.encode_stats(variables, x, train=True, upd=upd)
    p_x = module.discrim_logits(variables, g_x[-1])
    z0 = module.sample_latent(mu, ls, rng)
    if module.HAS_IAF:
        z, _, _ = module.iaf(variables, z0)
    else:
        z = z0
    # Decoder BN running stats update from this (reconstruction) pass --
    # without this, eval-mode decoding normalizes with init-time stats and
    # produces garbage (the reference updated every BN layer in the graph
    # via default_update side effects).
    x_hat = module.decode(variables, z, train=True, upd=upd)

    # pass 2: discriminator + introspection on the reconstruction
    g_xh = module.backbone(variables, x_hat, True, None)
    p_x_hat = module.discrim_logits(variables, g_xh[-1])

    # pass 3: discriminator on fresh samples
    x_gen = module.decode_pre_iaf(variables, z_rand, train=True, upd=None)
    g_gen = module.backbone(variables, x_gen, True, None)
    p_x_gen = module.discrim_logits(variables, g_gen[-1])

    return {
        "mu": mu,
        "ls": ls,
        "x_hat": x_hat,
        "p_x": p_x,
        "p_x_hat": p_x_hat,
        "p_x_gen": p_x_gen,
        "g_x": g_x,
        "g_xh": g_xh,
    }


def compute_metrics(cfg, out, x, n_classes):
    adv = L.adversarial_losses(out["p_x"], out["p_x_hat"], out["p_x_gen"], n_classes)
    pix = L.pixel_l1(out["x_hat"], x)
    feat = L.feature_matching(out["g_x"], out["g_xh"])
    kl = L.kl_to_standard_normal(out["mu"], out["ls"])
    err = L.pixel_mse(out["x_hat"], x)
    return {
        **adv,
        "pixel_loss": pix,
        "feature_loss": feat,
        "kl": kl,
        "pixel_acc": 1.0 - err,
    }


def gen_loss_fn(gen_latent_params, other, module, cfg, x, z_rand, rng):
    """Scalar whose gradient w.r.t. (gen ∪ latent) params reproduces the
    reference's gen_updates + Z_gen_updates (`train_IAN.py:256-276`):
      wrt decoder params: adv_gen + recon*pixel + feature*fw + ortho_gen
      wrt latent heads:   adv_gen + recon*pixel + feature*fw + kl + l2_Z
    The extra terms are disjoint across the two partitions (kl/l2 touch only
    latent heads; ortho_gen touches only 4-D decoder weights), so one scalar
    serves both."""
    variables = {**other, **gen_latent_params}
    variables, xc, zc = to_compute(variables, x, z_rand, cfg)
    upd = {}
    # Forward/backward in the compute dtype; losses and metrics in f32.
    out = _f32_tree(forward_all(module, variables, xc, zc, rng, upd=upd))
    adv = L.adversarial_losses(out["p_x"], out["p_x_hat"], out["p_x_gen"], module.N_DISCRIM_CLASSES)
    total = (
        cfg["agr_weight"] * adv["gen_recon_loss"]
        + cfg["ags_weight"] * adv["gen_sample_loss"]
        + cfg["recon_weight"] * L.pixel_l1(out["x_hat"], x)
        + cfg["feature_weight"] * L.feature_matching(out["g_x"], out["g_xh"])
        + L.kl_to_standard_normal(out["mu"], out["ls"])
        + cfg["reg"] * L.l2_penalty({k: v for k, v in gen_latent_params.items() if L.partition_of(k) == "latent"})
    )
    if cfg.get("ortho"):
        total = total + cfg["ortho"] * L.ortho_penalty(
            {k: v for k, v in gen_latent_params.items() if L.partition_of(k) == "gen"}
        )
    return total, (out, _f32_tree(upd))


def discrim_loss_fn(discrim_params, other, module, cfg, x, z_rand, rng):
    """Discriminator objective with consider_constant=[X_hat]
    (`train_IAN.py:253`): gradients do not flow into the generator."""
    variables = {**other, **discrim_params}
    variables, xc, zc = to_compute(variables, x, z_rand, cfg)
    upd = {}
    out_raw = forward_all(module, variables, xc, zc, rng, upd=upd)
    x_hat = jax.lax.stop_gradient(out_raw["x_hat"])  # compute dtype
    g_xh = module.backbone(variables, x_hat, True, None)
    p_x_hat = module.discrim_logits(variables, g_xh[-1])
    # Reuse the STOPPED pass's activations for the returned metrics too: the
    # values are identical to forward_all's unstopped x_hat pass (stop_grad
    # changes no primals), and with nothing else referencing that pass XLA
    # dead-code-eliminates it -- one full encoder forward saved per D step.
    out = _f32_tree({**out_raw, "g_xh": g_xh, "p_x_hat": p_x_hat})
    adv = L.adversarial_losses(out["p_x"], out["p_x_hat"], out["p_x_gen"], module.N_DISCRIM_CLASSES)
    total = cfg["dg_weight"] * adv["discrim_g_loss"] + cfg["dd_weight"] * adv["discrim_d_loss"]
    if cfg.get("ortho"):
        total = total + cfg["ortho"] * L.ortho_penalty(discrim_params)
    return total, (out, _f32_tree(upd))


def latent_loss_fn(latent_params, other, module, cfg, x, z_rand, rng):
    """Z_gen_updates objective alone (`train_IAN.py:266-273`), used on
    discriminator steps where the latent heads still train."""
    variables = {**other, **latent_params}
    variables, xc, zc = to_compute(variables, x, z_rand, cfg)
    out = _f32_tree(forward_all(module, variables, xc, zc, rng))
    adv = L.adversarial_losses(out["p_x"], out["p_x_hat"], out["p_x_gen"], module.N_DISCRIM_CLASSES)
    total = (
        cfg["feature_weight"] * L.feature_matching(out["g_x"], out["g_xh"])
        + cfg["recon_weight"] * L.pixel_l1(out["x_hat"], x)
        + cfg["agr_weight"] * adv["gen_recon_loss"]
        + cfg["ags_weight"] * adv["gen_sample_loss"]
        + L.kl_to_standard_normal(out["mu"], out["ls"])
        + cfg["reg"] * L.l2_penalty(latent_params)
    )
    return total, (out, {})
