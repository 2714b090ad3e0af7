"""Jitted training steps: the TPU equivalent of the reference's compiled
`update_gen` / `update_discrim` Theano functions (`train_IAN.py:283-325`).

Optimizer: three Adam instances, one per trainable partition, mirroring the
reference's three `lasagne.updates.adam` dicts -- with the latent-head
('Z_gen') moments advancing on EVERY step because that update dict is merged
into both players (`train_IAN.py:274-276`). Learning rate is a dynamic step
argument, so epoch-schedule changes (`train_IAN.py:446-456`) never trigger
recompilation. Unlike the reference, optimizer state is checkpointable
(SURVEY.md section 5 gap).
"""


import jax
import jax.numpy as jnp
import optax

from npe_tpu.training import losses as L
from npe_tpu.training.graph import compute_metrics, discrim_loss_fn, gen_loss_fn, latent_loss_fn

ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def _scale_by_adam_lp(b1, b2, eps, moments_dtype):
    """Adam scaling with the m/v moments STORED in a lower-precision dtype
    (opt-in via cfg['moments_dtype'], e.g. 'bfloat16'). The decay/bias-
    correction arithmetic runs in float32 every step (storage casts at the
    boundaries only), so the sole deviation from optax's scale_by_adam is
    the rounding of m and v to the storage dtype between steps.

    Why: the Adam update is HBM-bandwidth-bound on TPU (BENCHMARKS.md
    round-4 accounting: m/v/p traffic at the roofline, 8.5% of the train
    step); bf16 moments halve two of the three streams. The faithful
    recipes stay on f32 moments by default -- this is a deployment knob
    behind the versioned checkpoint ABI (utils/checkpoints.py).
    """
    dt = jnp.dtype(moments_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dt)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = jnp.float32
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32), state.mu, updates
        )
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32) + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu,
            updates,
        )
        bc1 = 1 - b1**count.astype(f32)
        bc2 = 1 - b2**count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32
        )
        store = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dt), t)
        return out, optax.ScaleByAdamState(count=count, mu=store(mu32), nu=store(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(beta1, moments_dtype=None):
    if moments_dtype:
        return _scale_by_adam_lp(beta1, ADAM_B2, ADAM_EPS, moments_dtype)
    return optax.scale_by_adam(b1=beta1, b2=ADAM_B2, eps=ADAM_EPS)


def init_train_state(module, variables, cfg):
    parts = L.partition_variables(variables)
    opt = make_optimizer(cfg["beta1"], cfg.get("moments_dtype"))
    return {
        "parts": parts,
        "opt": {
            "gen": opt.init(parts["gen"]),
            "latent": opt.init(parts["latent"]),
            "discrim": opt.init(parts["discrim"]),
        },
        "step": jnp.zeros((), jnp.int32),
    }


def _apply(opt, grads, opt_state, params, lr):
    updates, new_state = opt.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_state


def _grads_finite(*grad_trees):
    leaves = [
        jnp.all(jnp.isfinite(g))
        for t in grad_trees
        for g in jax.tree_util.tree_leaves(t)
    ]
    return jnp.stack(leaves).all() if leaves else jnp.array(True)


def _guarded(ok, new, old):
    """Select new vs old (params+opt) trees by the scalar `ok` flag."""
    return jax.tree_util.tree_map(lambda n, o: jnp.where(ok, n, o), new, old)


def make_train_steps(module, cfg, donate=True):
    """Returns (gen_step, discrim_step), both jitted:
    state, x, z_rand, rng, lr -> (state, metrics)."""
    opt = make_optimizer(cfg["beta1"], cfg.get("moments_dtype"))
    n_classes = module.N_DISCRIM_CLASSES
    # Optional non-finite-update guard (cfg['skip_nonfinite_updates'],
    # default OFF to keep the faithful recipes exactly the reference's
    # semantics): if any gradient in this step is inf/NaN, the whole update
    # (params, Adam moments, BN running stats) is dropped and the step
    # reports update_skipped=1. Motivation: the randomized-IAF tail-draw
    # overflow (docs/NUMERICS.md) -- one bad eps draw otherwise poisons the
    # parameters irrecoverably mid-run; with the guard it costs one skipped
    # step. Static flag: when off, no select ops enter the compiled step.
    guard = bool(cfg.get("skip_nonfinite_updates"))

    def gen_step(state, x, z_rand, rng, lr):
        parts = state["parts"]
        gl = {**parts["gen"], **parts["latent"]}
        other = {**parts["discrim"], **parts["frozen"], **parts["state"]}
        (loss, (out, upd)), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            gl, other, module, cfg, x, z_rand, rng
        )
        g_gen = {k: v for k, v in grads.items() if L.partition_of(k) == "gen"}
        g_lat = {k: v for k, v in grads.items() if L.partition_of(k) == "latent"}
        new_gen, opt_gen = _apply(opt, g_gen, state["opt"]["gen"], parts["gen"], lr)
        new_lat, opt_lat = _apply(opt, g_lat, state["opt"]["latent"], parts["latent"], lr)
        # BN running stats from the real-X pass, returned as aux by the loss.
        new_state_vars = {**parts["state"], **upd}
        metrics = compute_metrics(cfg, out, x, n_classes)
        if guard:
            ok = _grads_finite(g_gen, g_lat)
            (new_gen, new_lat, opt_gen, opt_lat, new_state_vars) = _guarded(
                ok,
                (new_gen, new_lat, opt_gen, opt_lat, new_state_vars),
                (
                    parts["gen"],
                    parts["latent"],
                    state["opt"]["gen"],
                    state["opt"]["latent"],
                    parts["state"],
                ),
            )
            metrics = {**metrics, "update_skipped": 1.0 - ok.astype(jnp.float32)}
        new = {
            "parts": {
                "gen": new_gen,
                "latent": new_lat,
                "discrim": parts["discrim"],
                "frozen": parts["frozen"],
                "state": new_state_vars,
            },
            "opt": {"gen": opt_gen, "latent": opt_lat, "discrim": state["opt"]["discrim"]},
            "step": state["step"] + 1,
        }
        return new, metrics

    def discrim_step(state, x, z_rand, rng, lr):
        parts = state["parts"]
        # ONE value_and_grad for BOTH the discriminator objective and the
        # merged latent-head ('Z_gen') objective (`train_IAN.py:274-276`).
        # The gradients stay exactly partition-isolated:
        #   * dloss has NO structural path to the latent heads (its x_hat is
        #     stop-gradiented, `train_IAN.py:253`, and D(x)/D(x_gen) bypass
        #     them), so d(dloss)/d(latent) == 0;
        #   * zloss sees the discrim tower/head through stop_gradient'ed
        #     WEIGHT copies (identity on primals, so XLA CSE still dedupes
        #     the two identical forwards), so d(zloss)/d(discrim) == 0.
        # NOTE measured: XLA CSE already merged the previous two-value_and_grad
        # formulation into this same HLO (cost analysis identical to the last
        # digit, 14.06 GFLOPs/img at b128) -- the single grad call states the
        # reference's merged update dict directly rather than buying FLOPs.
        # Gradient equality with the two-grad form is asserted in
        # tests/test_training_fast.py.
        other = {**parts["gen"], **parts["frozen"], **parts["state"]}

        def d_and_z_loss(dl_params, other, module, cfg, x, z_rand, rng):
            d_params = {k: v for k, v in dl_params.items() if L.partition_of(k) == "discrim"}
            l_params = {k: v for k, v in dl_params.items() if L.partition_of(k) == "latent"}
            dloss, (out, upd) = discrim_loss_fn(
                d_params, {**other, **l_params}, module, cfg, x, z_rand, rng
            )
            d_stop = {k: jax.lax.stop_gradient(v) for k, v in d_params.items()}
            zloss, _ = latent_loss_fn(
                l_params, {**other, **d_stop}, module, cfg, x, z_rand, rng
            )
            return dloss + zloss, (out, upd)

        dl_params = {**parts["discrim"], **parts["latent"]}
        (_, (out, upd)), grads = jax.value_and_grad(d_and_z_loss, has_aux=True)(
            dl_params, other, module, cfg, x, z_rand, rng
        )
        g_d = {k: v for k, v in grads.items() if L.partition_of(k) == "discrim"}
        g_z = {k: v for k, v in grads.items() if L.partition_of(k) == "latent"}
        new_d, opt_d = _apply(opt, g_d, state["opt"]["discrim"], parts["discrim"], lr)
        new_lat, opt_lat = _apply(opt, g_z, state["opt"]["latent"], parts["latent"], lr)
        new_state_vars = {**parts["state"], **upd}
        metrics = compute_metrics(cfg, out, x, n_classes)
        if guard:
            ok = _grads_finite(g_d, g_z)
            (new_d, new_lat, opt_d, opt_lat, new_state_vars) = _guarded(
                ok,
                (new_d, new_lat, opt_d, opt_lat, new_state_vars),
                (
                    parts["discrim"],
                    parts["latent"],
                    state["opt"]["discrim"],
                    state["opt"]["latent"],
                    parts["state"],
                ),
            )
            metrics = {**metrics, "update_skipped": 1.0 - ok.astype(jnp.float32)}
        new = {
            "parts": {
                "gen": parts["gen"],
                "latent": new_lat,
                "discrim": new_d,
                "frozen": parts["frozen"],
                "state": new_state_vars,
            },
            "opt": {"gen": state["opt"]["gen"], "latent": opt_lat, "discrim": opt_d},
            "step": state["step"] + 1,
        }
        return new, metrics

    donate_args = (0,) if donate else ()
    return (
        jax.jit(gen_step, donate_argnums=donate_args),
        jax.jit(discrim_step, donate_argnums=donate_args),
    )


# AdaptiveRatioGuard constants (train.AdaptiveRatioGuard is the host-side
# statement of the same semantics; tests assert the two agree step-for-step).
GUARD_DECAY = 0.9
GUARD_CHANCE = 0.5


def guard_schedule(scheduled_gen, ema, threshold):
    """Pure on-device restatement of `train.AdaptiveRatioGuard.should_gen`:
    a step scheduled for D by the faithful alternation trains G instead when
    the accuracy EMA exceeds `threshold`. Returns (is_gen, skip_d)."""
    skip_d = jnp.logical_and(jnp.logical_not(scheduled_gen), ema > threshold)
    return jnp.logical_or(scheduled_gen, skip_d), skip_d


def guard_ema_update(ema, is_gen, skip_d, d_acc):
    """Pure on-device restatement of the guard's EMA dynamics: a D step that
    ran observes its accuracy; a skipped D slot decays toward chance (which
    bounds the skip streak -- see AdaptiveRatioGuard); a scheduled G step
    leaves the EMA untouched."""
    observed = jnp.where(skip_d, GUARD_CHANCE, d_acc)
    return jnp.where(
        jnp.logical_and(is_gen, jnp.logical_not(skip_d)),
        ema,
        GUARD_DECAY * ema + (1 - GUARD_DECAY) * observed,
    )


def make_chunk_step(module, cfg, num_batches, donate=True, guard_acc=None):
    """ONE jitted program that runs a whole chunk: `lax.scan` over the
    chunk's batches, alternating G/D by `(itr0 + i) % (update_ratio + 1)`
    exactly like the host loop (reference `train_IAN.py:493-509`), with
    z_rand drawn and metrics averaged on-device.

    Rationale: the per-batch host loop costs 4-6 device dispatches per step;
    through the axon tunnel (~29 ms RPC) that measured 237 ms/step against
    the 19.6 ms the same step achieves inside a scan (round-2 real-run
    metrics vs bench_train.py). One chunk = one dispatch + one small fetch.

    Signature: chunk_step(state, x_chunk, itr0, rng, lr[, ema]) ->
        (state, rng_out, gen_metrics, discrim_metrics, gen_count[, ema])
    where x_chunk is (num_batches * batch_size, 64, 64, 3) staged data and
    the metric dicts are already averaged over this chunk's G / D steps.
    The per-batch RNG derivation (split-chain) is IDENTICAL to the host
    loop's, so a chunk program reproduces the per-step path bit-for-bit.

    guard_acc: when set (cfg['adaptive_ratio_acc'], the documented
    D-saturation deviation, docs/PARITY.md), the AdaptiveRatioGuard's
    decision runs ON-DEVICE as part of the scan: a scheduled D step whose
    accuracy EMA exceeds the threshold trains G instead, and the EMA decays
    toward chance while skipping (identical semantics to the host
    `train.AdaptiveRatioGuard`, asserted by tests). The EMA is a traced
    scalar threaded through the chunk signature -- the data-dependent G/D
    choice costs nothing on the host, where the round-3 host-loop guard
    cost ~12x the step time in tunnel RPCs."""
    gen_step, discrim_step = make_train_steps(module, cfg, donate=False)
    period = cfg["update_ratio"] + 1
    bs = cfg["batch_size"]
    zdim = cfg["num_latents"]

    def run_steps(state, ema, i, itr0, xb, z_rand, ks, lr):
        scheduled_gen = ((itr0 + i) % period) == 0
        if guard_acc is None:
            is_gen = scheduled_gen
            skip_d = jnp.array(False)
        else:
            is_gen, skip_d = guard_schedule(scheduled_gen, ema, guard_acc)
        state, m = jax.lax.cond(
            is_gen,
            lambda st: gen_step(st, xb, z_rand, ks, lr),
            lambda st: discrim_step(st, xb, z_rand, ks, lr),
            state,
        )
        if guard_acc is not None:
            ema = guard_ema_update(ema, is_gen, skip_d, m["discrim_acc"])
        return state, ema, m, is_gen

    def finish(state, rng, ms, is_gen):
        gen_w = is_gen.astype(jnp.float32)
        dis_w = 1.0 - gen_w
        n_gen = jnp.sum(gen_w)
        n_dis = jnp.sum(dis_w)
        gen_m = {k: jnp.sum(v * gen_w) / jnp.maximum(n_gen, 1) for k, v in ms.items()}
        dis_m = {k: jnp.sum(v * dis_w) / jnp.maximum(n_dis, 1) for k, v in ms.items()}
        return state, rng, gen_m, dis_m, n_gen

    if guard_acc is None:

        def chunk_step(state, x_chunk, itr0, rng, lr):
            def body(carry, i):
                state, rng = carry
                xb = jax.lax.dynamic_slice_in_dim(x_chunk, i * bs, bs)
                rng, kz, ks = jax.random.split(rng, 3)
                z_rand = jax.random.normal(kz, (bs, zdim))
                state, _, m, is_gen = run_steps(
                    state, None, i, itr0, xb, z_rand, ks, lr
                )
                return (state, rng), (m, is_gen)

            (state, rng), (ms, is_gen) = jax.lax.scan(
                body, (state, rng), jnp.arange(num_batches)
            )
            return finish(state, rng, ms, is_gen)

    else:

        def chunk_step(state, x_chunk, itr0, rng, lr, ema):
            def body(carry, i):
                state, rng, ema = carry
                xb = jax.lax.dynamic_slice_in_dim(x_chunk, i * bs, bs)
                rng, kz, ks = jax.random.split(rng, 3)
                z_rand = jax.random.normal(kz, (bs, zdim))
                state, ema, m, is_gen = run_steps(
                    state, ema, i, itr0, xb, z_rand, ks, lr
                )
                return (state, rng, ema), (m, is_gen)

            (state, rng, ema), (ms, is_gen) = jax.lax.scan(
                body, (state, rng, ema), jnp.arange(num_batches)
            )
            return (*finish(state, rng, ms, is_gen), ema)

    donate_args = (0,) if donate else ()
    return jax.jit(chunk_step, donate_argnums=donate_args)


def variables_of(state):
    return L.merge_partitions(state["parts"])
