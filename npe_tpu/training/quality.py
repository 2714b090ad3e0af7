"""Sample-quality metric: Frechet distance between encoder-feature
distributions of real and generated images ("encoder-FID").

The reference reports sample quality (Inception score) only in the paper
(arXiv 1609.07093; SURVEY.md section 6) -- the repo itself had no
quantitative quality signal beyond pixel accuracy. A classic FID needs an
InceptionV3 checkpoint (not available offline); the IAN's own shared
encoder/discriminator tower is the natural stand-in: its
GlobalPool(enc_conv4) features already define the feature-matching loss the
generator trains against (reference `train_IAN.py:244`), so a Frechet
distance in that space tracks the same notion of realism the objective uses.
Lower is better; it is comparable across checkpoints OF THE SAME encoder
(use a fixed reference checkpoint when comparing runs).

CLI: python -m npe_tpu.training.quality <config> [--dataset ...] [--num N]
prints one JSON line {"encoder_fid": ...}.
"""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.conv import global_avg_pool


def batched_features(module, variables, images_nhwc, batch_size=64):
    """GlobalPool(enc_conv4) features, (N, 1024) float64 numpy. Trailing
    examples that do not fill a batch are dropped (keeps one jitted shape)."""

    @jax.jit
    def feats(v, x):
        return global_avg_pool(module.backbone(v, x, False, None)[-1])

    n = (images_nhwc.shape[0] // batch_size) * batch_size
    assert n > 0, (images_nhwc.shape, batch_size)
    out = []
    for i in range(0, n, batch_size):
        out.append(np.asarray(feats(variables, jnp.asarray(images_nhwc[i : i + batch_size]))))
    return np.concatenate(out).astype(np.float64)


def feature_stats(features):
    """(mean, covariance) of a (N, D) float64 feature matrix."""
    mu = features.mean(axis=0)
    cov = np.cov(features, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps=1e-6):
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 (C1^1/2 C2 C1^1/2)^1/2).

    The matrix square roots use symmetric eigendecompositions (the
    covariances are PSD), with a small diagonal jitter for rank-deficient
    sample covariances -- equivalent to the usual scipy.linalg.sqrtm
    formulation without the complex-round-trip."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(mu1.size)
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(mu2.size)

    def psd_sqrt(m):
        w, q = np.linalg.eigh(m)
        return (q * np.sqrt(np.clip(w, 0, None))) @ q.T

    s1 = psd_sqrt(cov1)
    middle = psd_sqrt(s1 @ cov2 @ s1)
    d2 = float(np.sum((mu1 - mu2) ** 2) + np.trace(cov1 + cov2 - 2.0 * middle))
    return max(d2, 0.0)


def model_samples(module, variables, num, batch_size=64, seed=0):
    """Decode num random latents through the model's sample path (pre-IAF
    latents for IAF models, matching the training driver's Z ~ N(0,1) feed,
    reference `train_IAN.py:479`)."""
    decode = module.decode_pre_iaf if getattr(module, "HAS_IAF", False) else module.decode

    @jax.jit
    def gen(v, z):
        return decode(v, z)

    zdim = module.cfg["num_latents"]
    keys = jax.random.split(jax.random.PRNGKey(seed), -(-num // batch_size))
    outs = []
    for k in keys:
        z = jax.random.normal(k, (batch_size, zdim))
        outs.append(np.asarray(gen(variables, z)))
    return np.concatenate(outs)[:num]


def encoder_fid(
    module, variables, real_images_nhwc, num=None, batch_size=64, seed=0, feature_variables=None
):
    """Frechet distance between encoder features of `real_images_nhwc`
    (N, 64, 64, 3) in [-1, 1] and the same number of model samples.

    `feature_variables` fixes the encoder defining the feature space; pass a
    reference checkpoint's variables so the metric is comparable across
    checkpoints of a run (with the default None, features come from the
    *current* `variables` and the per-epoch curve conflates encoder drift
    with sample-quality change)."""
    num = num or real_images_nhwc.shape[0]
    batch_size = max(1, min(batch_size, num))  # small sets: one short batch
    fv = variables if feature_variables is None else feature_variables
    real = batched_features(module, fv, real_images_nhwc[:num], batch_size)
    gen = batched_features(
        module, fv, model_samples(module, variables, num, batch_size, seed), batch_size
    )
    return frechet_distance(*feature_stats(real), *feature_stats(gen))


def main():
    import argparse
    import json

    from npe_tpu.data import data_loader, get_dataset
    from npe_tpu.models import get_config
    from npe_tpu.utils import checkpoints

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--weights", default=None)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--num", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=64)
    a = p.parse_args()
    module = get_config(a.config)
    variables = module.init(jax.random.PRNGKey(0))
    weights = a.weights or f"{module.cfg['model']}.npz"
    checkpoints.load_weights(weights, variables)
    ds = get_dataset(a.dataset, num_examples=a.num)
    cfg = dict(module.cfg)
    cfg["batch_size"] = a.batch_size
    cfg["batches_per_chunk"] = max(1, -(-a.num // a.batch_size))
    chunk = next(iter(data_loader(cfg, ds, offset=0)))
    real = np.asarray(chunk).transpose(0, 2, 3, 1)
    fid = encoder_fid(module, variables, real, num=min(a.num, len(real)), batch_size=a.batch_size)
    print(json.dumps({"metric": "encoder_fid", "value": round(fid, 4), "num": a.num}))


if __name__ == "__main__":
    main()
