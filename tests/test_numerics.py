"""Pins the full-width IAN non-finite mechanism (VERDICT r4 item 1).

Measured on the real chip (scripts/debug_nonfinite.py; faithful lr 2e-4
first-bad-pair 202, lr 1e-6 first-bad-pair 309, identical chain both times):

  1. train-mode BN keeps the encoder's logsigma head O(3) -- but training on
     noise inputs drifts its scale up (max|ls| 2.83 -> 3.9 over ~200 pairs);
  2. the sampled latent z0 = mu + exp(ls)*eps has exp-heavy tails: a few-
     sigma eps draw gives |z0| ~ 100 (observed 105 / 76 at the bad pairs);
  3. the FROZEN random MADE ("randomized IAF", reference `IAN.py:1`) is
     piecewise-linear, so |iaf_logsigma| grows ~linearly with |z0|
     (observed iaf_ls ~ 0.5-0.65 * |z0|: 50 at z0=105, 48 at z0=76);
  4. `iaf_transform` divides by exp(iaf_logsigma) (`layers.py:649`): at
     iaf_ls ~ -50 the latent blows to ~1e23 (observed 1.8e23 / 6.6e21);
  5. the decoder's convs amplify a ~1e34+ latent past f32 max -> inf, and
     train-mode BN maps an inf activation to NaN ((inf - mean) * istd with
     istd=rsqrt(inf)=0 is inf*0): the loss, gradients, Adam moments and
     parameters are poisoned in one step. (Merely-HUGE finite activations
     are SATURATED by the same arithmetic: var overflows to inf, istd=0,
     output collapses to beta -- which is why the gen pass at the same pair
     survived with z=1.8e23.)

The reference computes the identical chain (`layers.py:426` exp-sampling,
`layers.py:649` exp-division, cuDNN train-mode BN) in the same float32, so
it diverges identically on the same inputs -- asserted below against the
torch replica of its IAF used by the converter goldens.

Why the real 80-epoch recipe never hit it: real-data encodings keep max|ls|
lower, and the tail probability is exp-sensitive to that scale (at init
scale 2.83 a NaN needs a ~7.6-sigma eps draw vs ~5 sigma at 3.9).
Why the 1/8-width profile "didn't reproduce": same mechanism, smaller
scale -- 16 latents draw 256 eps/step vs 1600 and its runs were 30 pairs,
so the tail was never sampled; its pair-0 amplification (z=4e5 from the
same chain) is asserted here instead of waited for.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_tpu.ops.made import iaf_transform, made_apply, made_init, made_masks
from npe_tpu.models import get_config
from npe_tpu.training import train_step as TS

HERE = os.path.dirname(os.path.abspath(__file__))
TINY_FULL = os.path.join(HERE, "tiny_ian_full.py")
D = 100  # full-width latent dim (`IAN.py:53`)


def _iaf_vars(key=0):
    v = {}
    v.update(made_init(jax.random.PRNGKey(key), "l_IAF_mu", D, [D]))
    v.update(made_init(jax.random.PRNGKey(key + 1), "l_IAF_ls", D, [D]))
    return v


def _iaf(v, z0):
    mu = made_apply(v, "l_IAF_mu", z0, n_hidden=1)
    ls = made_apply(v, "l_IAF_ls", z0, n_hidden=1)
    return iaf_transform(z0, mu, ls), mu, ls


def _worst_direction(v, n=64):
    """The unit latent direction (from a seeded candidate set) that the
    frozen MADE maps to the most negative logsigma."""
    dirs = jax.random.normal(jax.random.PRNGKey(9), (n, D))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    ls = made_apply(v, "l_IAF_ls", 100.0 * dirs, n_hidden=1)
    return dirs[jnp.argmin(jnp.min(ls, axis=1))]


def test_frozen_made_amplifies_linearly_to_overflow():
    """Steps 3+4: iaf_logsigma grows ~linearly with |z0| under the frozen
    orthogonal MADE, so the exp-division amplification is exp(c*|z0|) and
    crosses f32 range at tail-draw scales (|z0| ~ 100-200)."""
    v = _iaf_vars()
    d = _worst_direction(v)

    def probe(c):
        z, _, ls = _iaf(v, (c * d)[None])
        return float(jnp.min(ls)), float(jnp.max(jnp.abs(z)))

    ls50, z50 = probe(50.0)
    ls100, z100 = probe(100.0)
    ls200, z200 = probe(200.0)
    # ~linear growth of the most negative logsigma with |z0|
    assert ls100 < 0.6 * ls50 and ls200 < 1.6 * ls100, (ls50, ls100, ls200)
    # amplification is already catastrophic at z0 ~ 100 ...
    assert z100 > 1e8, z100
    # ... and past f32 range (inf) or astronomically close by z0 ~ 200
    assert z200 > 1e30 or not np.isfinite(z200), z200
    # while the DISTRIBUTION-TYPICAL |z0| ~ 3 stays perfectly tame
    _, z_typ = probe(3.0)
    assert z_typ < 1e3, z_typ


def test_reference_iaf_diverges_identically():
    """The reference's IAF graph ((z-mu)/exp(ls), `layers.py:641-650`,
    replicated in torch by the converter goldens) produces the SAME
    amplification and the same non-finiteness on the same weights+inputs --
    the divergence is the reference's own math, not a porting artifact."""
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "full_model_goldens", os.path.join(HERE, "test_convert_full_model.py")
    )
    goldens = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(goldens)

    v = _iaf_vars()
    ordering = list(range(1, D + 1))  # made_init default ordering
    masks = made_masks(D, [D])
    p = {k: np.asarray(a) for k, a in v.items() if not k.endswith("weights_mask")}
    np.testing.assert_array_equal(
        np.asarray(v["l_IAF_mu_input.weights_mask"]), masks[0][0]
    )

    d = _worst_direction(v)
    for c in (3.0, 50.0, 120.0, 250.0):
        z0 = np.asarray((c * d)[None], np.float32)
        ours = np.asarray(_iaf(v, jnp.asarray(z0))[0])
        theirs = goldens._torch_iaf(p, masks, torch.from_numpy(z0)).numpy()
        if np.isfinite(ours).all() and np.isfinite(theirs).all():
            np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4)
        else:
            # both diverge, on the same entries
            np.testing.assert_array_equal(
                np.isfinite(ours), np.isfinite(theirs)
            )
    # and the tail scale does take at least one of the probes non-finite
    z_tail = np.asarray(_iaf(v, jnp.asarray((250.0 * d)[None]))[0])
    assert not np.isfinite(z_tail).all() or np.abs(z_tail).max() > 1e30


def test_decoder_bn_saturates_huge_but_nan_on_inf():
    """Step 5 boundary: train-mode decode of a HUGE-but-finite latent stays
    finite (BN's istd collapses to 0 and the layer output to beta), while a
    latent that has already overflowed to inf produces NaN. Tiny profile --
    identical decode/BN code paths, shapes read from the weights."""
    m = get_config(TINY_FULL)
    v = m.init(jax.random.PRNGKey(0))
    zdim = m.cfg["num_latents"]
    z_huge = jnp.full((2, zdim), 1e20, jnp.float32)
    x_huge = m.decode(v, z_huge, train=True, upd=None)
    assert bool(jnp.isfinite(x_huge).all()), "BN saturation should keep this finite"
    z_inf = z_huge.at[0, 0].set(jnp.inf)
    x_inf = m.decode(v, z_inf, train=True, upd=None)
    assert not bool(jnp.isfinite(x_inf).all()), "inf latent must surface, not vanish"


def test_skip_nonfinite_updates_guard():
    """cfg['skip_nonfinite_updates']: a step whose gradients go non-finite
    leaves params, Adam moments and BN stats bit-identical and reports
    update_skipped=1; a healthy step trains normally with the guard on."""
    m = get_config(TINY_FULL)
    cfg = dict(m.cfg)
    cfg["skip_nonfinite_updates"] = True
    v = m.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(m, v, cfg)
    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg["num_latents"]))

    # healthy step: trains, not skipped
    s1, mg = gen_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    assert float(mg["update_skipped"]) == 0.0
    assert any(
        not np.array_equal(np.asarray(s1["parts"]["gen"][k]), np.asarray(state["parts"]["gen"][k]))
        for k in state["parts"]["gen"]
    )

    # poisoned batch: the forward/backward goes non-finite; everything the
    # step would update must come through untouched
    x_bad = x.at[0, 0, 0, 0].set(jnp.nan)
    for step, moved in ((gen_step, ("gen", "latent")), (discrim_step, ("discrim", "latent"))):
        s2, mm = step(state, x_bad, z, jax.random.PRNGKey(3), 2e-4)
        assert float(mm["update_skipped"]) == 1.0
        for part in moved + ("state",):
            for k in state["parts"][part]:
                np.testing.assert_array_equal(
                    np.asarray(s2["parts"][part][k]),
                    np.asarray(state["parts"][part][k]),
                    err_msg=f"{part}/{k}",
                )
        for g1, g2 in zip(
            jax.tree_util.tree_leaves(state["opt"]), jax.tree_util.tree_leaves(s2["opt"])
        ):
            np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
