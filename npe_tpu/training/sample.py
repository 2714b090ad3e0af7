"""Sampling / eval driver (reference `sample_IAN.py`).

Compiles the four inference functions -- `sample` (decode from pre-IAF
latent), `sampleZ` (decode from post-IAF latent), `Zfn` (encode to pre-IAF),
`Z_IAF_fn` (run the flow alone) (`sample_IAN.py:86-94`) -- loads weights,
and writes the 6x9 sample/interpolation grid to
pics/<config>_sample<epoch>.png.

CLI: python -m npe_tpu.training.sample IAN_simple --epoch 10
"""

import argparse
import os

import jax

from npe_tpu.data import get_dataset
from npe_tpu.models import get_config
from npe_tpu.training.eval_grids import sample_and_interp_grid
from npe_tpu.utils import checkpoints


def make_inference_functions(module):
    """The reference's tfuncs dict (`sample_IAN.py:86-100`)."""
    return {
        "sample": jax.jit(lambda v, z: module.decode_pre_iaf(v, z)),
        "sampleZ": jax.jit(lambda v, z: module.decode(v, z)),
        "Zfn": jax.jit(lambda v, x: module.encode_pre_iaf(v, x)),
        "Z_IAF_fn": jax.jit(lambda v, z: module.iaf(v, z)[0]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config_path")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--weights", default=None)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()

    module = get_config(a.config_path)
    name = module.cfg["model"]
    variables = module.init(jax.random.PRNGKey(0))
    weights = a.weights or (name + ".npz")
    if os.path.isfile(weights):
        checkpoints.load_weights(weights, variables)
    dataset = get_dataset(a.dataset)
    os.makedirs("pics", exist_ok=True)
    out = f"pics/{name}_sample{a.epoch}.png"
    sample_and_interp_grid(module, variables, dataset, out, seed=a.seed)
    print("wrote", out)


if __name__ == "__main__":
    main()
