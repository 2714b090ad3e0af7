"""Validation evaluation -- the legacy driver's validation-MSE loop
(reference `train_IAN_simple.py:759-800`) which the current reference driver
dropped; restored here as a proper eval pass: deterministic encode/decode
over the validation set with the two half-batch offsets, reporting
pixel accuracy (1 - MSE)."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.data import data_loader


def validation_pixel_accuracy(module, variables, dataset, cfg, max_chunks=None):
    """Returns dict(test_error=float pixel accuracy in [0,1], mse=float)."""

    @jax.jit
    def recon_mse(v, x):
        z = module.encode(v, x)
        x_hat = module.decode(v, z)
        return jnp.mean((x_hat - x) ** 2)

    # clamp the chunk size so validation sets smaller than a training chunk
    # still produce at least one chunk
    vcfg = dict(cfg)
    vcfg["batches_per_chunk"] = max(
        1, min(cfg["batches_per_chunk"], dataset.num_examples // cfg["batch_size"] - 1)
    )
    errs = []
    for o in range(2):
        loader = data_loader(vcfg, dataset, offset=o * vcfg["batch_size"] // 2)
        for ci, chunk in enumerate(loader):
            if max_chunks is not None and ci >= max_chunks:
                break
            num_batches = len(chunk) // cfg["batch_size"]
            x_dev = jnp.asarray(chunk.transpose(0, 2, 3, 1))
            for bi in range(num_batches):
                xb = jax.lax.dynamic_slice_in_dim(x_dev, bi * cfg["batch_size"], cfg["batch_size"])
                errs.append(float(recon_mse(variables, xb)))
    mse = float(np.mean(errs)) if errs else float("nan")
    return {"test_error": 1.0 - mse, "mse": mse}
