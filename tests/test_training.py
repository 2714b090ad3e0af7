"""Training-step integration tests: partition isolation, BN-state threading,
frozen IAF, metrics sanity (reference semantics per `train_IAN.py:184-276`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from npe_tpu.models import get_config
from npe_tpu.training import losses as L
from npe_tpu.training import train_step as TS


@pytest.fixture(scope="module")
def setup():
    m = get_config("IAN_simple")
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(m, v, cfg)
    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 100))
    return m, cfg, state, gen_step, discrim_step, x, z


def _l2_delta(a, b):
    return sum(float(jnp.sum((a[k] - b[k]) ** 2)) for k in a)


def test_partitions_cover_all_variables():
    m = get_config("IAN")
    v = m.init(jax.random.PRNGKey(0))
    parts = L.partition_variables(v)
    assert sum(len(p) for p in parts.values()) == len(v)
    # MADE/IAF params frozen (the reference's randomized IAF)
    assert any(k.startswith("l_IAF_") for k in parts["frozen"])
    assert all(not k.startswith("l_IAF_") for k in parts["gen"])
    # latent heads are their own partition (the reference's Z_params)
    assert "enc_fc1.W" in parts["latent"]
    assert "enc_mu.W" in parts["latent"]
    # conv tower belongs to the discriminator
    assert "enc_conv1.W" in parts["discrim"]
    assert "discrimi.W" in parts["discrim"]
    # decoder in gen
    assert "l_dec_fc2.W" in parts["gen"]


def test_gen_step_updates_gen_and_latent_only(setup):
    m, cfg, state, gen_step, discrim_step, x, z = setup
    s2, metrics = gen_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    assert _l2_delta(s2["parts"]["gen"], state["parts"]["gen"]) > 0
    assert _l2_delta(s2["parts"]["latent"], state["parts"]["latent"]) > 0
    assert _l2_delta(s2["parts"]["discrim"], state["parts"]["discrim"]) == 0
    # BN stats moved -- ENCODER and DECODER both (the decoder-stat bug made
    # eval-mode decoding garbage while train-mode looked fine)
    for stat in ("bnorm2.mean", "bnorm_dec_fc2.mean", "bnorm_dc1.mean", "bnorm_dc3.inv_std"):
        assert (
            float(
                jnp.sum(jnp.abs(s2["parts"]["state"][stat] - state["parts"]["state"][stat]))
            )
            > 0
        ), stat
    for k, val in metrics.items():
        assert np.isfinite(float(val)), k


def test_discrim_step_updates_discrim_and_latent_only(setup):
    m, cfg, state, gen_step, discrim_step, x, z = setup
    s2, metrics = discrim_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    assert _l2_delta(s2["parts"]["discrim"], state["parts"]["discrim"]) > 0
    assert _l2_delta(s2["parts"]["latent"], state["parts"]["latent"]) > 0
    assert _l2_delta(s2["parts"]["gen"], state["parts"]["gen"]) == 0
    assert float(metrics["discrim_d_loss"]) > 0


def test_ortho_penalty_zero_for_orthogonal_rows():
    # a kernel whose H slices are orthonormal rows gives zero penalty
    w = jnp.zeros((2, 1, 1, 1)).at[0, 0, 0, 0].set(1.0)
    # y[o,h,h'] = sum_{w,i} W[h,w,i,o] W[h',w,i,o]; with H=2, W=1, I=1, O=1:
    w = jnp.array([[[[1.0]]], [[[0.0]]]])  # (2,1,1,1), rows e1, 0
    p = float(L.ortho_res(w))
    # y = [[1,0],[0,0]]; |y - I| = 1
    assert abs(p - 1.0) < 1e-6


def test_adversarial_losses_binary_and_ternary():
    logits3 = jnp.array([[3.0, -1.0, -1.0], [3.0, -1.0, -1.0]])
    out = L.adversarial_losses(logits3, logits3, logits3, 3)
    assert float(out["discrim_d_loss"]) < 0.1  # confident real
    assert float(out["gen_recon_loss"]) < 0.1  # recon classified real -> gen happy
    logits1 = jnp.array([[4.0], [4.0]])
    out1 = L.adversarial_losses(logits1, logits1, logits1, 1)
    assert float(out1["discrim_d_loss"]) < 0.05
    assert float(out1["discrim_g_loss"]) > 1.0
