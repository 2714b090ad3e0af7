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


def test_mixed_precision_step_matches_f32_trajectory():
    """bf16 compute / f32 master weights (cfg['compute_dtype']): a short
    alternating G/D trajectory stays within tolerance of the f32 one, the
    master params and BN running stats remain float32, and losses are finite.
    (VERDICT r2 item 2's guard test.)"""
    m = get_config("IAN_simple")
    base_cfg = dict(m.cfg)
    base_cfg["batch_size"] = 4
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(12), (4, 100))

    def run(compute_dtype, n_pairs=3):
        cfg = dict(base_cfg)
        if compute_dtype:
            cfg["compute_dtype"] = compute_dtype
        v = m.init(jax.random.PRNGKey(0))
        state = TS.init_train_state(m, v, cfg)
        gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
        traj = []
        for i in range(n_pairs):
            k = jax.random.PRNGKey(100 + i)
            state, mg = gen_step(state, x, z, k, 2e-4)
            state, md = discrim_step(state, x, z, jax.random.fold_in(k, 1), 2e-4)
            traj.append((float(mg["pixel_loss"]), float(mg["kl"]), float(md["discrim_d_loss"])))
        return state, np.asarray(traj)

    sf, tf = run(None)
    sb, tb = run("bfloat16")

    assert np.all(np.isfinite(tb))
    # master weights and optimizer moments stay f32
    for part in ("gen", "latent", "discrim"):
        for k, p in sb["parts"][part].items():
            assert p.dtype == np.float32, (part, k, p.dtype)
    for k in ("bnorm2.mean", "bnorm2.inv_std"):
        assert sb["parts"]["state"][k].dtype == np.float32
    # trajectories agree within bf16 tolerance (loose: 3 G/D pairs compound
    # the rounding; catches wrong-dtype-accumulation bugs by an order of
    # magnitude, not rounding noise)
    np.testing.assert_allclose(tb, tf, rtol=0.12, atol=0.02)


def test_chunk_step_single_step_forward_parity():
    """A 1-batch chunk program reproduces one gen_step EXACTLY at the
    forward/metric level (same RNG derivation, same slicing). Param updates
    may differ by O(lr): Adam normalizes the gradient, so compiler-dependent
    backward rounding flips near-zero gradient signs -- covered by the
    trajectory test below at the appropriate tolerance."""
    m = get_config("IAN_simple")
    cfg = dict(m.cfg)
    cfg["batch_size"] = 4
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 64, 64, 3)) * 0.5
    rng0 = jax.random.PRNGKey(21)
    lr = 2e-4
    state = TS.init_train_state(m, v, cfg)
    gen_step, _ = TS.make_train_steps(m, cfg, donate=False)
    rng, kz, ks = jax.random.split(rng0, 3)
    z = jax.random.normal(kz, (4, cfg["num_latents"]))
    _, mm = gen_step(state, x, z, ks, lr)

    state2 = TS.init_train_state(m, v, cfg)
    chunk = TS.make_chunk_step(m, cfg, 1, donate=False)
    _, rng_out, gen_m, _, n_gen = chunk(state2, x, 0, rng0, lr)
    assert float(n_gen) == 1.0
    np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
    for k in gen_m:
        np.testing.assert_allclose(float(gen_m[k]), float(mm[k]), rtol=1e-6, err_msg=k)


def test_chunk_step_matches_per_step_loop():
    """TS.make_chunk_step (one scanned program per chunk, on-device z_rand +
    metric averaging) follows the per-step host loop: same split-chain RNG,
    same G/D alternation by (itr0 + i) % (update_ratio + 1). Params agree to
    O(lr) per step (Adam sign-amplifies backward rounding, see above);
    metrics to a few percent after the step-2+ divergence."""
    m = get_config("IAN_simple")
    cfg = dict(m.cfg)
    cfg["batch_size"] = 4
    nb = 4  # G, D, G, D
    v = m.init(jax.random.PRNGKey(0))
    x_chunk = jax.random.normal(jax.random.PRNGKey(7), (nb * 4, 64, 64, 3)) * 0.5
    rng0 = jax.random.PRNGKey(21)
    lr = 2e-4

    # reference: the host loop
    state = TS.init_train_state(m, v, cfg)
    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
    rng = rng0
    ref_metrics = []
    for bi in range(nb):
        xb = x_chunk[bi * 4 : (bi + 1) * 4]
        rng, kz, ks = jax.random.split(rng, 3)
        z_rand = jax.random.normal(kz, (4, cfg["num_latents"]))
        step = gen_step if bi % 2 == 0 else discrim_step
        state, mm = step(state, xb, z_rand, ks, lr)
        ref_metrics.append({k: float(val) for k, val in mm.items()})
    ref_state = state

    # one chunk program, itr0=0
    state2 = TS.init_train_state(m, v, cfg)
    chunk_step = TS.make_chunk_step(m, cfg, nb, donate=False)
    state2, rng_out, gen_m, dis_m, n_gen = chunk_step(state2, x_chunk, 0, rng0, lr)

    assert float(n_gen) == 2.0
    np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
    for part in ("gen", "latent", "discrim", "state"):
        for k in ref_state["parts"][part]:
            # params: a few Adam steps of sign-noise divergence (atol ~ lr);
            # BN running stats: relative tolerance (rsqrt of a 4-sample
            # variance amplifies the same divergence multiplicatively)
            np.testing.assert_allclose(
                np.asarray(state2["parts"][part][k]),
                np.asarray(ref_state["parts"][part][k]),
                rtol=0.3 if part == "state" else 0,
                atol=8 * lr,
                err_msg=f"{part}/{k}",
            )
    for k in gen_m:
        want = np.mean([ref_metrics[i][k] for i in (0, 2)])
        np.testing.assert_allclose(float(gen_m[k]), want, rtol=0.05, atol=0.02, err_msg=k)
        want_d = np.mean([ref_metrics[i][k] for i in (1, 3)])
        np.testing.assert_allclose(float(dis_m[k]), want_d, rtol=0.05, atol=0.02, err_msg=k)


def test_full_ian_mixed_precision_trajectory():
    """Full-IAN bf16 numeric guard (round 3): the frozen-MADE masked-dense
    path (W bf16 * mask f32 -> cast, npe_tpu/ops/made.py) joins the
    trajectory-equivalence property already held by IAN_simple. Two G/D
    pair at batch 2; bf16 must track f32 loosely and keep f32 masters.
    (One pair only: full-IAN fwd+bwd compiles dominate on the 1-core box.)"""
    m = get_config("IAN")
    base_cfg = dict(m.cfg)
    base_cfg["batch_size"] = 2
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(22), (2, base_cfg["num_latents"]))

    def run(compute_dtype, n_pairs=1):
        cfg = dict(base_cfg)
        if compute_dtype:
            cfg["compute_dtype"] = compute_dtype
        v = m.init(jax.random.PRNGKey(0))
        state = TS.init_train_state(m, v, cfg)
        gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
        traj = []
        for i in range(n_pairs):
            k = jax.random.PRNGKey(300 + i)
            state, mg = gen_step(state, x, z, k, 2e-4)
            state, md = discrim_step(state, x, z, jax.random.fold_in(k, 1), 2e-4)
            traj.append((float(mg["pixel_loss"]), float(mg["kl"]), float(md["discrim_d_loss"])))
        return state, np.asarray(traj)

    sf, tf = run(None)
    sb, tb = run("bfloat16")
    assert np.all(np.isfinite(tb))
    for part in ("gen", "latent", "frozen", "discrim"):
        for k, p in sb["parts"][part].items():
            assert p.dtype == np.float32, (part, k, p.dtype)
    np.testing.assert_allclose(tb, tf, rtol=0.15, atol=0.03)
