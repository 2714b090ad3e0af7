"""Root-cause harness for the full-width IAN non-finite forward on
bench_train's random-noise inputs (VERDICT r4 item 1 / ROADMAP item 4).

Reproduces bench_train.py's exact G+D pair stream (same inputs, same
fold_in RNG derivation) with per-pair diagnostics captured on-device:
all training metrics, finiteness of every partition and the Adam moments,
and max-|.| of the latent-path intermediates (mu, logsigma, sampled z,
MADE/IAF outputs, x_hat, discriminator logits). The scan is gated on a
RUNTIME pair count and lr, so one compile serves every probe.

Usage:
  python scripts/debug_nonfinite.py [--model IAN] [--batch 16]
      [--pairs 400] [--lr 2e-4] [--compute-dtype '']
Prints one JSON line per pair until the first non-finite event, then a
summary.
"""

import argparse
import functools
import json

import jax
import jax.numpy as jnp


def tree_allfinite(tree):
    leaves = [jnp.all(jnp.isfinite(a)) for a in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)]
    return jnp.stack(leaves).all() if leaves else jnp.array(True)


def tree_maxabs(tree):
    leaves = [jnp.max(jnp.abs(a)) for a in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)]
    return jnp.max(jnp.stack(leaves)) if leaves else jnp.array(0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IAN")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pairs", type=int, default=400)
    p.add_argument("--max-pairs", type=int, default=600)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--compute-dtype", default=None)
    a = p.parse_args()

    from npe_tpu.models import get_config
    from npe_tpu.training import train_step as TS
    from npe_tpu.training import graph as G

    module = get_config(a.model)
    cfg = dict(module.cfg)
    cfg["batch_size"] = a.batch
    if a.compute_dtype:
        cfg["compute_dtype"] = a.compute_dtype
    variables = module.init(jax.random.PRNGKey(0))
    state0 = TS.init_train_state(module, variables, cfg)
    gen_step, discrim_step = TS.make_train_steps(module, cfg, donate=False)
    MAXP = a.max_pairs

    def probe(variables, x, z_rand, rng):
        """Latent-path intermediates of the gen pass (same rng as gen_step)."""
        variables, xc, zc = G.to_compute(variables, x, z_rand, cfg)
        mu, ls, _ = module.encode_stats(variables, xc, train=True, upd=None)
        z0 = module.sample_latent(mu, ls, rng)
        d = {
            "max_mu": tree_maxabs(mu),
            "max_ls": tree_maxabs(ls),
            "max_z0": tree_maxabs(z0),
        }
        if module.HAS_IAF:
            z, imu, ils = module.iaf(variables, z0)
            d.update(max_iaf_mu=tree_maxabs(imu), max_iaf_ls=tree_maxabs(ils),
                     max_z=tree_maxabs(z))
        else:
            z = z0
        x_hat = module.decode(variables, z, train=True, upd=None)
        gx = module.backbone(variables, x_hat, True, None)
        d.update(
            max_x_hat=tree_maxabs(x_hat),
            finite_frac_x_hat=jnp.mean(jnp.isfinite(x_hat).astype(jnp.float32)),
            max_p_x_hat=tree_maxabs(module.discrim_logits(variables, gx[-1])),
        )
        return {k: v.astype(jnp.float32) for k, v in d.items()}

    @functools.partial(jax.jit, static_argnames=())
    def run(state, x, z, key, n, lr):
        def body(carry, i):
            state = carry
            active = i < n

            def do(state):
                k = jax.random.fold_in(key, i)
                diag = probe(TS.variables_of(state), x, z, k)
                state, mg = gen_step(state, x, z, k, lr)
                state, md = discrim_step(state, x, z, jax.random.fold_in(k, 1), lr)
                flags = {
                    "fin_gen": tree_allfinite(state["parts"]["gen"]),
                    "fin_latent": tree_allfinite(state["parts"]["latent"]),
                    "fin_discrim": tree_allfinite(state["parts"]["discrim"]),
                    "fin_state": tree_allfinite(state["parts"]["state"]),
                    "fin_opt": tree_allfinite(state["opt"]),
                }
                out = {**{f"g_{k2}": v for k2, v in mg.items()},
                       **{f"d_{k2}": v for k2, v in md.items()},
                       **diag,
                       **{k2: v.astype(jnp.float32) for k2, v in flags.items()}}
                return state, out

            def skip(state):
                _, proto = jax.eval_shape(do, state)
                return state, jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), proto)

            return jax.lax.cond(active, do, skip, state)

        state, diags = jax.lax.scan(body, state, jnp.arange(MAXP))
        return state, diags

    # Bench inputs, bit-identical to bench_train.py.
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (a.batch, 64, 64, 3), jnp.float32) * 0.5)
    z = jax.random.normal(jax.random.PRNGKey(2), (a.batch, cfg["num_latents"]))

    state, diags = run(state0, x, z, jax.random.PRNGKey(10),
                       jnp.int32(a.pairs), jnp.float32(a.lr))
    diags = jax.device_get(diags)
    first_bad = None
    for i in range(a.pairs):
        row = {k: float(v[i]) for k, v in diags.items()}
        bad = (not all(row[f] == 1.0 for f in
                       ("fin_gen", "fin_latent", "fin_discrim", "fin_state", "fin_opt"))
               or not all(jnp.isfinite(row[k]) for k in row))
        if bad or i % 25 == 0 or i == a.pairs - 1:
            print(json.dumps({"pair": i, **{k: round(v, 6) if jnp.isfinite(v) else str(v)
                                            for k, v in row.items()}}), flush=True)
        if bad and first_bad is None:
            first_bad = i
            # print a window around the event
            for j in range(max(0, i - 3), i):
                row2 = {k: float(v[j]) for k, v in diags.items()}
                print(json.dumps({"pair": j, **{k: round(v, 6) if jnp.isfinite(v) else str(v)
                                                for k, v in row2.items()}}), flush=True)
            break
    print(json.dumps({"summary": {"model": a.model, "batch": a.batch, "lr": a.lr,
                                  "pairs_run": a.pairs, "first_bad_pair": first_bad,
                                  "compute_dtype": a.compute_dtype or "float32"}}),
          flush=True)


if __name__ == "__main__":
    main()
