"""IAN training losses and parameter partitions (reference
`train_IAN.py:47-276`).

Parameter-partition semantics replicated exactly from the reference's
Lasagne graph walks (`train_IAN.py:184-194`):

  * 'discrim' = everything upstream of l_discrim: the conv tower + minibatch
    layer + output dense. Trained by the discriminator loss only.
  * 'latent'  = get_all_params(l_Z_IAF) minus the discrim set: enc_fc1 and
    the mu/logsigma heads with their batch norms. These are the reference's
    (misleadingly commented) `Z_params`, trained on EVERY step -- the
    `Z_gen_updates` dict is merged into both players' updates
    (`train_IAN.py:274-276`).
  * 'gen'     = params of l_out not upstream of l_Z: the decoder.
  * 'frozen'  = the MADE/IAF nets. The reference never places them in any
    update dict (they are in get_all_params(l_Z), hence excluded from
    decoder_params, and not in Z_params either) -- IAN.py:1 is titled
    "IAN with RANDOMIZED IAF": the flow keeps its orthogonal init and only
    its masks are shuffled. Preserved faithfully.

Loss definitions (`train_IAN.py:169-250`): pixel L1 (x2), KL to N(0,1),
ternary or binary adversarial CE, introspective feature-matching MSE, and
the orthogonal regularizer `ortho_res` (`train_IAN.py:158-165`).
"""

import jax
import jax.numpy as jnp

LATENT_HEAD_PREFIXES = (
    "enc_fc1.",
    "bnorm_enc_fc1.",
    "enc_mu.",
    "mu_bnorm.",
    "enc_logsigma.",
    "ls_bnorm.",
)
DISCRIM_PREFIXES = (
    "enc_conv",
    "bnorm2.",
    "bnorm3.",
    "bnorm4.",
    "minibatch_discrim.",
    "discrimi.",
)
FROZEN_PREFIXES = ("l_IAF_",)


def partition_of(name):
    from npe_tpu.models.common import is_trainable

    if not is_trainable(name):
        return "state"
    if name.startswith(FROZEN_PREFIXES):
        return "frozen"
    if name.startswith(LATENT_HEAD_PREFIXES):
        return "latent"
    if name.startswith(DISCRIM_PREFIXES):
        return "discrim"
    return "gen"


def partition_variables(variables):
    parts = {"discrim": {}, "latent": {}, "gen": {}, "frozen": {}, "state": {}}
    for k, v in variables.items():
        parts[partition_of(k)][k] = v
    return parts


def merge_partitions(parts):
    out = {}
    for d in parts.values():
        out.update(d)
    return out


# --- individual losses -------------------------------------------------------


def pixel_l1(x_hat, x):
    """`train_IAN.py:169`: mean(2*|X_hat - X + 1e-8|)."""
    return jnp.mean(2.0 * jnp.abs(x_hat - x + 1e-8))


def pixel_mse(x_hat, x):
    return jnp.mean((x_hat - x) ** 2)


def gaussian_nll_pixel(x_hat, x, log_sigma):
    """Gaussian NLL pixel loss with a learned per-pixel log_sigma map -- the
    legacy driver's variant (reference `train_IAN_simple.py:300-310`,
    log_sigma_theta shape (3,64,64)): 0.5*mean(log(2*pi) + 2*log_sigma +
    (x_hat - x)^2 / exp(2*log_sigma))."""
    return 0.5 * jnp.mean(
        jnp.log(2 * jnp.pi) + 2 * log_sigma + (x_hat - x) ** 2 / jnp.exp(2 * log_sigma)
    )


def kl_to_standard_normal(mu, ls):
    """`train_IAN.py:172`: -0.5*mean(1 + 2*ls - mu^2 - exp(2*ls))."""
    return -0.5 * jnp.mean(1 + 2 * ls - mu**2 - jnp.exp(2 * ls))


def feature_matching(feats_x, feats_xhat):
    """Introspective loss (`train_IAN.py:244`): mean over layers of MSE."""
    losses = [jnp.mean((a - b) ** 2) for a, b in zip(feats_x, feats_xhat)]
    return jnp.mean(jnp.stack(losses))


def softmax_ce(logits, class_idx):
    """Categorical CE against a constant one-hot class."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, class_idx])


def sigmoid_bce(logits, target):
    """Binary CE against a constant 0/1 target, stable form."""
    x = logits[:, 0]
    # log(1+exp(-x)) stable: max(x,0) - x*t + log1p(exp(-|x|))
    return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))


def ortho_res(w):
    """`train_IAN.py:158-165` on a 4-D weight: with reference OIHW tensor x,
    y[o,h,h'] = sum_{i,w} x[o,i,h,w] x[o,i,h',w]; penalty = sum|y - I|.
    Our kernels are HWIO; the equivalent contraction is over (w, i)."""
    y = jnp.einsum("hwio,kwio->ohk", w, w)
    eye = jnp.eye(w.shape[0], dtype=w.dtype)[None]
    return jnp.sum(jnp.abs(y - eye))


def ortho_penalty(params):
    """Applied to every 4-D param named *W (`train_IAN.py:161`)."""
    s = 0.0
    for k, v in params.items():
        if k.endswith("W") and v.ndim == 4:
            s = s + ortho_res(v)
    return s


def l2_penalty(params):
    """Lasagne l2 over 'regularizable' params = weight matrices, not
    biases/gains (`train_IAN.py:211-213`)."""
    s = 0.0
    for k, v in params.items():
        if k.endswith("W") or k.endswith(".theta"):
            s = s + jnp.sum(v**2)
    return s


# --- adversarial objectives ---------------------------------------------------

# Ternary class indices (`train_IAN.py:482-484`): p1=real, p2=recon, p3=sample.
REAL, RECON, SAMPLE = 0, 1, 2


def adversarial_losses(p_x, p_x_hat, p_x_gen, n_classes):
    """Returns dict with discrim_d/discrim_g/gen_recon/gen_sample losses and
    discriminator accuracy, for ternary-softmax (`train_IAN.py:228-250`) or
    binary-sigmoid (legacy `train_IAN_simple.py:395-407`) discriminators."""
    if n_classes == 3:
        d_g = softmax_ce(p_x_hat, RECON) + softmax_ce(p_x_gen, SAMPLE)
        d_d = softmax_ce(p_x, REAL)
        g_recon = softmax_ce(p_x_hat, REAL)
        g_sample = softmax_ce(p_x_gen, REAL)
        acc = (
            jnp.mean(jnp.argmax(p_x, -1) == REAL)
            + jnp.mean(jnp.argmax(p_x_hat, -1) == RECON)
            + jnp.mean(jnp.argmax(p_x_gen, -1) == SAMPLE)
        ) / 3.0
    else:
        d_g = sigmoid_bce(p_x_hat, 0.0) + sigmoid_bce(p_x_gen, 0.0)
        d_d = sigmoid_bce(p_x, 1.0)
        g_recon = sigmoid_bce(p_x_hat, 1.0)
        g_sample = sigmoid_bce(p_x_gen, 1.0)
        acc = (
            jnp.mean(p_x[:, 0] > 0) + jnp.mean(p_x_hat[:, 0] < 0) + jnp.mean(p_x_gen[:, 0] < 0)
        ) / 3.0
    return {
        "discrim_g_loss": d_g,
        "discrim_d_loss": d_d,
        "gen_recon_loss": g_recon,
        "gen_sample_loss": g_sample,
        "discrim_acc": acc,
    }
