"""MADE (masked autoencoder for distribution estimation) + IAF, functional.

The reference wraps M. Germain's MADE (`layers.py:735-853`) around a stateful
`MaskGenerator` (`mask_generator.py:15-103`) whose Theano shared variables are
mutated by compiled `shuffle_ordering` / `sample_connectivity` functions; the
training driver calls `shuffle("Once")` (`train_IAN.py:404-405`) and loaders
call `reset("Once")` (`API.py:33-36`, `sample_IAN.py:165-166`).

TPU-native redesign: masks are a pure, deterministic function of
(seed, n_shuffles) computed host-side at init and stored in the model's
variables dict as non-trainable `weights_mask` arrays -- same names as the
reference, same exclusion from checkpoints (the reference never saves masks
either; it regenerates them at load, which is exactly what a deterministic
function of the seed gives us for free).

Connectivity rule replicated from `mask_generator.py:93-94`:
    mask[i, j] = (conn_in[i] <= conn_out[j])
with conn_input = ordering + 1, conn_output = ordering, and hidden
connectivity sampled from p(v) proportional to l * v over v in
[min(prev_conn), D-1] plus a unit spike at v = min(prev_conn)
(`mask_generator.py:75-91`). The shipped models use l = 0
(`layers.py:756`), which makes hidden connectivity deterministically
min(prev_conn).

Known reference limitation preserved: hidden sizes must equal the latent dim
("BAD_PARAM" warning, reference README.md:67-69) is NOT required here -- any
hidden size works -- but defaults mirror the reference ([num_latents]).
"""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.initializers import orthogonal
from npe_tpu.ops.linear import dense
from npe_tpu.ops.activations import relu


class MaskGenerator:
    """Deterministic, replayable mask machinery (reference
    `mask_generator.py`). Host-side numpy; masks are tiny (D x H)."""

    def __init__(self, input_size, hidden_sizes, l=0.0, seed=1234):
        self.input_size = input_size
        self.hidden_sizes = list(hidden_sizes)
        self.l = l
        self.seed = seed
        self.reset()

    def reset(self):
        self._rng = np.random.RandomState(self.seed)
        self.ordering = np.arange(self.input_size)
        self.sample_connectivity()

    def shuffle_ordering(self):
        self.ordering = self._rng.permutation(self.input_size)

    def sample_connectivity(self):
        self.conns = []
        prev = self.ordering + 1
        for h in self.hidden_sizes:
            start = int(prev.min())
            if self.l == 0:
                conn = np.full(h, start)
            else:
                vals = np.arange(start, self.input_size)
                p = self.l * vals.astype(np.float64)
                p[0] += 1.0
                p = p / p.sum()
                conn = self._rng.choice(vals, size=h, p=p)
            self.conns.append(conn)
            prev = conn

    def shuffle(self, shuffling_type):
        """MADE.shuffle semantics (reference `layers.py:831-843`)."""
        if shuffling_type in ("Once", "Ordering", "Full"):
            self.shuffle_ordering()
        if shuffling_type in ("Once", "Connectivity", "Full"):
            self.sample_connectivity()

    def masks(self):
        """Returns ([mask per masked layer...], direct_input_mask).

        Layer masks: input->h1, h_i->h_{i+1}, h_last->output.
        Direct mask: input->output (reference DIML, `layers.py:680-707`).
        """
        chain = [self.ordering + 1] + self.conns + [self.ordering]
        layer_masks = [
            (chain[i][:, None] <= chain[i + 1][None, :]).astype(np.float32)
            for i in range(len(chain) - 1)
        ]
        direct = (chain[0][:, None] <= chain[-1][None, :]).astype(np.float32)
        return layer_masks, direct


def made_masks(input_size, hidden_sizes, seed=1234, n_shuffles=1, l=0.0, ordering=None):
    """The reference's shuffle('Once') / reset('Once') protocol as a pure
    function: reset, then `n_shuffles` Full shuffles. Pass `ordering`
    explicitly to reproduce a specific trained checkpoint's permutation
    (needed when converting Theano weights)."""
    gen = MaskGenerator(input_size, hidden_sizes, l=l, seed=seed)
    for _ in range(n_shuffles):
        gen.shuffle("Full")
    if ordering is not None:
        gen.ordering = np.asarray(ordering)
        gen.sample_connectivity()
    return gen.masks()


def made_init(key, name, input_size, hidden_sizes, seed=1234, n_shuffles=1):
    """Init MADE params + mask state. Returns a flat dict keyed with the
    reference's parameter names (`layers.py:767-803`)."""
    init = orthogonal("relu")
    sizes = [input_size] + list(hidden_sizes)
    v = {}
    keys = jax.random.split(key, len(hidden_sizes) + 2)
    layer_names = []
    for i in range(len(hidden_sizes)):
        lname = f"{name}_input" if i == 0 else f"{name}_layer_{i}"
        layer_names.append(lname)
        v[f"{lname}.W"] = init(keys[i], (sizes[i], sizes[i + 1]))
        v[f"{lname}.b"] = np.zeros(sizes[i + 1], np.float32)
    v[f"{name}_output_W.W"] = init(keys[-2], (sizes[-1], input_size))
    v[f"{name}_output_W.b"] = np.zeros(input_size, np.float32)
    v[f"{name}_output_D.W"] = init(keys[-1], (input_size, input_size))
    v[f"{name}_output_D.b"] = np.zeros(input_size, np.float32)
    layer_masks, direct = made_masks(input_size, hidden_sizes, seed, n_shuffles)
    for lname, m in zip(layer_names, layer_masks[:-1]):
        v[f"{lname}.weights_mask"] = m
    v[f"{name}_output_W.weights_mask"] = layer_masks[-1]
    v[f"{name}_output_D.weights_mask"] = direct
    return v


def masked_dense(z, w, mask, b=None, nonlinearity=None):
    """MaskedLayer / DIML core op (reference `layers.py:653-707`): dense with
    a non-trainable binary weights_mask. The mask is 0/1 (exact in every
    float dtype), so it casts to the weight's compute dtype instead of
    promoting a bf16 mixed-precision forward back to f32."""
    out = dense(z, w * mask.astype(w.dtype), b)
    return nonlinearity(out) if nonlinearity is not None else out


def _masked(v, name):
    w = v[f"{name}.W"]
    return w * v[f"{name}.weights_mask"].astype(w.dtype)


def made_apply(v, name, z, n_hidden=1):
    """Forward pass (reference `layers.py:817-818` -> masked stack + DIML,
    summed). Hidden nonlinearity relu, output linear."""
    h = z
    for i in range(n_hidden):
        lname = f"{name}_input" if i == 0 else f"{name}_layer_{i}"
        h = relu(dense(h, _masked(v, lname), v[f"{lname}.b"]))
    out = dense(h, _masked(v, f"{name}_output_W"), v[f"{name}_output_W.b"])
    direct = dense(z, _masked(v, f"{name}_output_D"), v[f"{name}_output_D.b"])
    return out + direct


def iaf_transform(z, mu, logsigma):
    """IAFLayer (reference `layers.py:641-650`): (z - mu) / exp(logsigma)."""
    return (z - mu) / jnp.exp(logsigma)
