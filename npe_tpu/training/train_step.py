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


def make_optimizer(beta1):
    return optax.scale_by_adam(b1=beta1, b2=ADAM_B2, eps=ADAM_EPS)


def init_train_state(module, variables, cfg):
    parts = L.partition_variables(variables)
    opt = make_optimizer(cfg["beta1"])
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


def make_train_steps(module, cfg, donate=True):
    """Returns (gen_step, discrim_step), both jitted:
    state, x, z_rand, rng, lr -> (state, metrics)."""
    opt = make_optimizer(cfg["beta1"])
    n_classes = module.N_DISCRIM_CLASSES

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
        other_d = {
            **parts["gen"],
            **parts["latent"],
            **parts["frozen"],
            **parts["state"],
        }
        (dloss, (out, upd)), g_d = jax.value_and_grad(discrim_loss_fn, has_aux=True)(
            parts["discrim"], other_d, module, cfg, x, z_rand, rng
        )
        other_z = {
            **parts["gen"],
            **parts["discrim"],
            **parts["frozen"],
            **parts["state"],
        }
        (zloss, _), g_z = jax.value_and_grad(latent_loss_fn, has_aux=True)(
            parts["latent"], other_z, module, cfg, x, z_rand, rng
        )
        new_d, opt_d = _apply(opt, g_d, state["opt"]["discrim"], parts["discrim"], lr)
        new_lat, opt_lat = _apply(opt, g_z, state["opt"]["latent"], parts["latent"], lr)
        new_state_vars = {**parts["state"], **upd}
        metrics = compute_metrics(cfg, out, x, n_classes)
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


def variables_of(state):
    return L.merge_partitions(state["parts"])
