"""Fast (un-slow-marked) coverage for the training crown jewels on the tiny
profiles: G/D partition isolation incl. the frozen MADE partition, chunk-
program parity with the host loop, DP sharding parity, and the adaptive-
ratio D-saturation guard (VERDICT r3 items 5 and 9).

The tiny profiles (`tests/tiny_ian.py`, `tests/tiny_ian_full.py`) share
every apply/step code path with the full-width configs (shapes are read from
the weights), so these exercise the same machinery as the slow full-width
tests at seconds of compile cost."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_tpu.models import get_config
from npe_tpu.training import train_step as TS
from npe_tpu.training.train import AdaptiveRatioGuard

HERE = os.path.dirname(os.path.abspath(__file__))
TINY = os.path.join(HERE, "tiny_ian.py")
TINY_FULL = os.path.join(HERE, "tiny_ian_full.py")


def _l2_delta(a, b):
    return sum(float(jnp.sum((a[k] - b[k]) ** 2)) for k in a)


def test_tiny_full_partition_isolation():
    """Full-IAN semantics at 1/8 width: a G step moves gen+latent only, a D
    step moves discrim+latent only, the frozen MADE partition stays
    bit-identical on both (reference `train_IAN.py:184-276`), BN stats
    thread through, metrics finite."""
    m = get_config(TINY_FULL)
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(m, v, cfg)
    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg["num_latents"]))

    assert state["parts"]["frozen"], "tiny full profile must have a frozen MADE partition"
    frozen0 = {k: np.asarray(a) for k, a in state["parts"]["frozen"].items()}

    sg, mg = gen_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    assert _l2_delta(sg["parts"]["gen"], state["parts"]["gen"]) > 0
    assert _l2_delta(sg["parts"]["latent"], state["parts"]["latent"]) > 0
    assert _l2_delta(sg["parts"]["discrim"], state["parts"]["discrim"]) == 0
    for k, a0 in frozen0.items():
        np.testing.assert_array_equal(np.asarray(sg["parts"]["frozen"][k]), a0, err_msg=k)
    # BN stats moved in encoder, decoder trunk, and an MDBLOCK norm
    for stat in ("bnorm2.mean", "bnorm_dc4.mean", "dec_conv2abnorm1.inv_std"):
        assert (
            float(jnp.sum(jnp.abs(sg["parts"]["state"][stat] - state["parts"]["state"][stat]))) > 0
        ), stat
    for k, val in mg.items():
        assert np.isfinite(float(val)), k

    sd, md = discrim_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    assert _l2_delta(sd["parts"]["discrim"], state["parts"]["discrim"]) > 0
    assert _l2_delta(sd["parts"]["latent"], state["parts"]["latent"]) > 0
    assert _l2_delta(sd["parts"]["gen"], state["parts"]["gen"]) == 0
    for k, a0 in frozen0.items():
        np.testing.assert_array_equal(np.asarray(sd["parts"]["frozen"][k]), a0, err_msg=k)
    assert float(md["discrim_d_loss"]) > 0


def test_tiny_chunk_step_matches_per_step_loop():
    """The whole-chunk `lax.scan` program follows the per-step host loop on
    the tiny profile: identical RNG chain, same G/D alternation, params
    within Adam sign-noise, metrics within a few percent (fast twin of
    test_training.test_chunk_step_matches_per_step_loop)."""
    m = get_config(TINY)
    cfg = dict(m.cfg)
    cfg["batch_size"] = 4
    nb = 4  # G, D, G, D
    lr = 2e-4
    v = m.init(jax.random.PRNGKey(0))
    x_chunk = jax.random.normal(jax.random.PRNGKey(7), (nb * 4, 64, 64, 3)) * 0.5
    rng0 = jax.random.PRNGKey(21)

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

    state2 = TS.init_train_state(m, v, cfg)
    chunk_step = TS.make_chunk_step(m, cfg, nb, donate=False)
    state2, rng_out, gen_m, dis_m, n_gen = chunk_step(state2, x_chunk, 0, rng0, lr)

    assert float(n_gen) == 2.0
    np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
    for part in ("gen", "latent", "discrim", "state"):
        for k in ref_state["parts"][part]:
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


def test_tiny_data_parallel_step_matches_single_device():
    """DP-sharded tiny gen step == unsharded numerics (GSPMD's gradient
    all-reduce implements the same global batch); fast twin of
    test_parallel.test_data_parallel_step_matches_single_device."""
    from npe_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state

    m = get_config(TINY)
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (8, cfg["num_latents"]))
    rng = jax.random.PRNGKey(3)
    lr = 2e-4

    gen_step, _ = TS.make_train_steps(m, cfg, donate=False)
    s_single = TS.init_train_state(m, v, cfg)
    s_single, m_single = gen_step(s_single, x, z, rng, lr)
    jax.block_until_ready(m_single)

    mesh = make_mesh(shape=(8, 1))
    s_shard = shard_train_state(TS.init_train_state(m, v, cfg), mesh)
    s_shard, m_shard = gen_step(s_shard, shard_batch(x, mesh), shard_batch(z, mesh), rng, lr)
    jax.block_until_ready(m_shard)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )
    w_a = np.asarray(s_single["parts"]["gen"]["dec_out.W"])
    w_b = np.asarray(s_shard["parts"]["gen"]["dec_out.W"])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-2, atol=2 * lr + 1e-6)


def test_fused_d_step_grads_match_two_grad_form():
    """The D step's single value_and_grad over (discrim ∪ latent) must equal
    the two independent grads (discrim loss wrt discrim; Z loss wrt latent):
    the stop_gradient plumbing keeps the partitions exactly isolated
    (reference `train_IAN.py:253,274-276` semantics)."""
    from npe_tpu.training import losses as L
    from npe_tpu.training.graph import discrim_loss_fn, latent_loss_fn

    m = get_config(TINY_FULL)
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(m, v, cfg)
    parts = state["parts"]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg["num_latents"]))
    rng = jax.random.PRNGKey(3)

    other_d = {**parts["gen"], **parts["latent"], **parts["frozen"], **parts["state"]}
    _, g_d_ref = jax.value_and_grad(discrim_loss_fn, has_aux=True)(
        parts["discrim"], other_d, m, cfg, x, z, rng
    )
    other_z = {**parts["gen"], **parts["discrim"], **parts["frozen"], **parts["state"]}
    _, g_z_ref = jax.value_and_grad(latent_loss_fn, has_aux=True)(
        parts["latent"], other_z, m, cfg, x, z, rng
    )

    def d_and_z_loss(dl_params, other):
        d_params = {k: w for k, w in dl_params.items() if L.partition_of(k) == "discrim"}
        l_params = {k: w for k, w in dl_params.items() if L.partition_of(k) == "latent"}
        dloss, _ = discrim_loss_fn(d_params, {**other, **l_params}, m, cfg, x, z, rng)
        d_stop = {k: jax.lax.stop_gradient(w) for k, w in d_params.items()}
        zloss, _ = latent_loss_fn(l_params, {**other, **d_stop}, m, cfg, x, z, rng)
        return dloss + zloss

    other = {**parts["gen"], **parts["frozen"], **parts["state"]}
    grads = jax.grad(d_and_z_loss)({**parts["discrim"], **parts["latent"]}, other)
    assert grads
    for k, g in grads.items():
        ref = (g_d_ref if L.partition_of(k) == "discrim" else g_z_ref)[k]
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5, atol=1e-7, err_msg=k)


# --- adaptive-ratio D-saturation guard ---------------------------------------


def test_adaptive_guard_faithful_when_unsaturated():
    """Below the threshold the guard IS the reference alternation
    (`train_IAN.py:493-509`): G on itr % period == 0, D otherwise."""
    g = AdaptiveRatioGuard(threshold=0.9, period=2)
    sched = []
    for itr in range(8):
        if g.should_gen(itr):
            sched.append("G")
        else:
            sched.append("D")
            g.observe(0.5)  # D stays at chance
    assert sched == ["G", "D"] * 4


def test_adaptive_guard_engages_and_disengages():
    """A saturating D engages skipping within a few observations; once
    engaged, the EMA decays toward chance so a later scheduled D step
    re-probes; a recovered (chance-level) probe keeps the guard off."""
    g = AdaptiveRatioGuard(threshold=0.8, period=2)
    # saturate: feed perfect D accuracy on every D step until skipping starts
    itr = 0
    d_steps_before_engage = 0
    while True:
        if g.should_gen(itr):
            if itr % 2 == 1:  # scheduled D step was skipped -> engaged
                break
        else:
            g.observe(1.0)
            d_steps_before_engage += 1
        itr += 1
        assert itr < 100, "guard never engaged on a perfectly saturated D"
    assert d_steps_before_engage >= 1

    # disengage: while skipping, the EMA decays; within a bounded number of
    # scheduled D slots the guard must let a probe D step through again
    skips = 0
    while True:
        itr += 1
        if itr % 2 == 0:
            assert g.should_gen(itr)
            continue
        if g.should_gen(itr):
            skips += 1
            assert skips < 50, "guard latched on forever (EMA never decayed)"
        else:
            break  # probe D step ran -- disengaged
    # and a healthy probe keeps it disengaged on the next scheduled D step
    g.observe(0.5)
    assert not g.should_gen(itr + 2) or (itr + 2) % 2 == 0


def test_on_device_guard_matches_host_oracle():
    """The pure on-device guard functions (TS.guard_schedule /
    TS.guard_ema_update, the ones the guarded chunk program scans with)
    reproduce the host AdaptiveRatioGuard decision-for-decision and EMA-for-
    EMA over a 300-step sequence whose D accuracies repeatedly saturate and
    recover (so the guard engages, decays, probes, and re-engages)."""
    period, threshold = 2, 0.8
    rs = np.random.RandomState(11)
    # blocks of saturated (~1.0) and healthy (~0.5) D accuracies
    d_acc = np.where(
        (np.arange(300) // 40) % 2 == 0,
        rs.uniform(0.95, 1.0, 300),
        rs.uniform(0.45, 0.55, 300),
    ).astype(np.float32)

    host = AdaptiveRatioGuard(threshold=threshold, period=period)
    ema_dev = jnp.float32(TS.GUARD_CHANCE)
    for itr in range(300):
        scheduled_gen = jnp.array(itr % period == 0)
        is_gen, skip_d = TS.guard_schedule(scheduled_gen, ema_dev, threshold)
        host_gen = host.should_gen(itr)
        assert bool(is_gen) == host_gen, itr
        ema_dev = TS.guard_ema_update(ema_dev, is_gen, skip_d, jnp.float32(d_acc[itr]))
        if not host_gen:
            host.observe(d_acc[itr])
        np.testing.assert_allclose(float(ema_dev), host.ema, rtol=0, atol=1e-5)


def test_guarded_chunk_faithful_when_threshold_unreachable():
    """make_chunk_step(guard_acc=1.1) can never engage (accuracy <= 1), so
    the guarded program must be the faithful alternation BIT-FOR-BIT: same
    params, same RNG chain, same G count as the unguarded chunk program.
    Plus the returned EMA follows the oracle's update rule exactly (checked
    on a 2-step chunk where the single D step's accuracy is recoverable from
    the averaged metrics)."""
    m = get_config(TINY)
    cfg = dict(m.cfg)
    cfg["batch_size"] = 4
    nb, lr = 4, 2e-4
    v = m.init(jax.random.PRNGKey(0))
    x_chunk = jax.random.normal(jax.random.PRNGKey(7), (nb * 4, 64, 64, 3)) * 0.5
    rng0 = jax.random.PRNGKey(21)

    s_ref = TS.init_train_state(m, v, cfg)
    s_ref, rng_ref, _, _, n_gen_ref = TS.make_chunk_step(m, cfg, nb, donate=False)(
        s_ref, x_chunk, 0, rng0, lr
    )

    s_g = TS.init_train_state(m, v, cfg)
    s_g, rng_g, _, _, n_gen_g, ema = TS.make_chunk_step(
        m, cfg, nb, donate=False, guard_acc=1.1
    )(s_g, x_chunk, 0, rng0, lr, jnp.float32(TS.GUARD_CHANCE))

    assert float(n_gen_g) == float(n_gen_ref) == 2.0
    np.testing.assert_array_equal(np.asarray(rng_g), np.asarray(rng_ref))
    for part in ("gen", "latent", "discrim", "state"):
        for k in s_ref["parts"][part]:
            np.testing.assert_array_equal(
                np.asarray(s_g["parts"][part][k]),
                np.asarray(s_ref["parts"][part][k]),
                err_msg=f"{part}/{k}",
            )
    assert 0.0 <= float(ema) <= 1.0

    # EMA formula: a 2-step chunk runs exactly one D step, whose accuracy IS
    # the averaged dis_m -- so the returned EMA must be one oracle update.
    s2 = TS.init_train_state(m, v, cfg)
    _, _, _, dis_m, _, ema2 = TS.make_chunk_step(m, cfg, 2, donate=False, guard_acc=1.1)(
        s2, x_chunk[: 2 * 4], 0, rng0, lr, jnp.float32(TS.GUARD_CHANCE)
    )
    want = TS.GUARD_DECAY * TS.GUARD_CHANCE + (1 - TS.GUARD_DECAY) * float(
        dis_m["discrim_acc"]
    )
    np.testing.assert_allclose(float(ema2), want, rtol=0, atol=1e-6)


def test_guarded_chunk_skips_all_d_when_threshold_zero():
    """make_chunk_step(guard_acc=0.0) engages immediately (EMA starts at
    chance > 0): every scheduled D slot trains G instead, and the EMA stays
    pinned at chance (the skip decay's fixed point)."""
    m = get_config(TINY)
    cfg = dict(m.cfg)
    cfg["batch_size"] = 4
    nb = 4
    v = m.init(jax.random.PRNGKey(0))
    x_chunk = jax.random.normal(jax.random.PRNGKey(7), (nb * 4, 64, 64, 3)) * 0.5
    state = TS.init_train_state(m, v, cfg)
    state, _, _, _, n_gen, ema = TS.make_chunk_step(m, cfg, nb, donate=False, guard_acc=0.0)(
        state, x_chunk, 0, jax.random.PRNGKey(21), 2e-4, jnp.float32(TS.GUARD_CHANCE)
    )
    assert float(n_gen) == float(nb)
    np.testing.assert_allclose(float(ema), TS.GUARD_CHANCE, rtol=0, atol=1e-7)
    # D never ran: its params are untouched
    s0 = TS.init_train_state(m, v, cfg)
    assert _l2_delta(state["parts"]["discrim"], s0["parts"]["discrim"]) == 0


def test_adaptive_ratio_train_integration(tmp_path):
    """The adaptive path in training.train runs end-to-end with a tiny
    profile -- since round 5 the guard runs ON-DEVICE inside the chunk
    program (EMA threaded through the scan), so this exercises the guarded
    chunk signature plus the d_steps_skipped metric plumbing."""
    from npe_tpu.training.train import train

    train(
        config=TINY,
        dataset_spec="synthetic",
        max_epochs=1,
        num_examples=16,
        out_dir=str(tmp_path),
        pics_dir=str(tmp_path / "pics"),
        checkpoint_grids=False,
        cfg_overrides={"adaptive_ratio_acc": 0.8, "batch_size": 4, "batches_per_chunk": 2},
    )
    import json

    recs = [json.loads(l) for l in open(tmp_path / "tiny_ianMETRICS.jsonl") if l.strip()]
    chunk_recs = [r for r in recs if "metrics" in r]
    assert len(chunk_recs) == 2
    for r in chunk_recs:
        for v in r["metrics"].values():
            assert np.isfinite(v)


def test_bf16_adam_moments_trajectory_and_roundtrip(tmp_path):
    """Opt-in bf16 Adam moments (cfg['moments_dtype'], versioned-ABI knob):
    the m/v state is stored bf16, the first step is exactly the f32 step
    (zero moments round-trip exactly), a short trajectory stays within a
    small relative bound of the f32-moments trajectory, and the state
    round-trips through the train-state checkpoint with dtypes intact."""
    from npe_tpu.utils.checkpoints import load_train_state, save_train_state

    m = get_config(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (4, m.cfg["num_latents"]))

    def run(moments_dtype, pairs):
        cfg = dict(m.cfg)
        if moments_dtype:
            cfg["moments_dtype"] = moments_dtype
        v = m.init(jax.random.PRNGKey(0))
        state = TS.init_train_state(m, v, cfg)
        gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
        for i in range(pairs):
            k = jax.random.fold_in(jax.random.PRNGKey(7), i)
            state, _ = gen_step(state, x, z, k, 2e-4)
            state, _ = discrim_step(state, x, z, jax.random.fold_in(k, 1), 2e-4)
        return state

    s32 = run(None, 1)
    s16 = run("bfloat16", 1)
    mu16 = jax.tree_util.tree_leaves(s16["opt"]["gen"])
    assert any(a.dtype == jnp.bfloat16 for a in mu16 if hasattr(a, "dtype"))
    # First G+D pair: moments start at zero (exact in bf16), so the Adam
    # direction m_hat/sqrt(v_hat) is sign(g)-like and dtype-insensitive --
    # params after one pair agree tightly.
    for part in ("gen", "latent", "discrim"):
        for k in s32["parts"][part]:
            a, b = np.asarray(s32["parts"][part][k]), np.asarray(s16["parts"][part][k])
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-6, err_msg=k)

    s32 = run(None, 10)
    s16 = run("bfloat16", 10)
    # Trajectory equivalence bound after 10 G+D pairs (= 20 Adam steps of
    # size <= ~lr each, since |m_hat/sqrt(v_hat)| ~ 1): the bf16 rounding of
    # m/v perturbs each step by O(2^-8) relative and the adversarial
    # dynamics amplify it, but the accumulated divergence must stay a small
    # fraction of the worst-case path length n_steps * lr. (A per-tensor
    # net-movement denominator is too strict: oscillating tensors like late
    # BN betas travel far while moving little.)
    n_steps, lr = 20, 2e-4
    for part in ("gen", "latent", "discrim"):
        for k in s32["parts"][part]:
            a, b = np.asarray(s32["parts"][part][k]), np.asarray(s16["parts"][part][k])
            rms = float(np.sqrt(np.mean((a - b) ** 2)))
            assert rms <= 0.25 * n_steps * lr, (k, rms)

    f = str(tmp_path / "state16.npz")
    save_train_state(f, s16)
    out = load_train_state(f)
    lv16 = jax.tree_util.tree_leaves(out["opt"])
    assert any(np.asarray(a).dtype == jnp.bfloat16 for a in lv16)
    for k in s16["parts"]["gen"]:
        np.testing.assert_array_equal(
            np.asarray(out["parts"]["gen"][k]), np.asarray(s16["parts"]["gen"][k])
        )
