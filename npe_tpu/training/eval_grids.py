"""Sample / reconstruction / interpolation grids -- the reference's
qualitative regression artifact (`train_IAN.py:536-561`, `sample_IAN.py:
171-191`): 27 random samples + 3 rows of [endpoint, 7-step latent lerp,
endpoint] laid out as a 6x9 grid."""

import jax
import numpy as np

from npe_tpu.utils.plotting import plot_image_grid
from npe_tpu.utils.ranges import from_tanh, to_tanh


def sample_and_interp_grid(module, variables, dataset, save_path, seed=0):
    rng = np.random.RandomState(seed)
    zdim = module.cfg["num_latents"]

    decode_pre = jax.jit(lambda v, z: module.decode_pre_iaf(v, z))
    encode_pre = jax.jit(lambda v, x: module.encode_pre_iaf(v, x))

    # 27 random samples through the pre-IAF entry point (`train_IAN.py:543`)
    z27 = rng.randn(27, zdim).astype(np.float32)
    samples = np.uint8(
        np.clip(from_tanh(np.asarray(decode_pre(variables, z27))), 0, 255)
    ).transpose(0, 3, 1, 2)

    # 6 endpoints from the dataset (`train_IAN.py:548`)
    endpoints = np.uint8(dataset.get_data(rng.choice(dataset.num_examples, 6, replace=False)))
    x = to_tanh(np.float32(endpoints)).transpose(0, 2, 3, 1)
    ze = np.asarray(encode_pre(variables, x))

    # 7-step lerp per pair (`train_IAN.py:554`)
    z_interp = np.asarray(
        [
            ze[2 * i] * (1 - j) + ze[2 * i + 1] * j
            for i in range(3)
            for j in [k / 6.0 for k in range(7)]
        ],
        dtype=np.float32,
    )
    recon = np.uint8(
        np.clip(from_tanh(np.asarray(decode_pre(variables, z_interp))), 0, 255)
    ).transpose(0, 3, 1, 2)

    rows = [
        np.concatenate([endpoints[2 * i : 2 * i + 1], recon[7 * i : 7 * (i + 1)], endpoints[2 * i + 1 : 2 * i + 2]])
        for i in range(3)
    ]
    images = np.concatenate([samples] + rows)
    plot_image_grid(images, 6, 9, save_path)
    return images
