"""Data-staging Pallas kernel: uint8 NCHW chunk -> float32 NHWC in [-1, 1].

The reference stages host numpy chunks onto the GPU via shared-variable
set_value and converts ranges on the host (`train_IAN.py:371,478`). Here the
uint8 bytes ship to HBM (4x less PCIe/ICI traffic than float32) and a
gridded Pallas kernel does the cast + to_tanh + NCHW->NHWC transpose on-chip,
one image per grid step so Mosaic pipelines HBM->VMEM loads with compute.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _kernel(u8_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    x = u8_ref[:].astype(jnp.int32).astype(jnp.float32)  # (1, 3, H, W) block
    x = 2.0 * (x / 255.0) - 1.0
    out_ref[:] = jnp.transpose(x, (0, 2, 3, 1))


def stage_uint8_to_tanh(chunk_u8, interpret=False):
    """chunk_u8: (N, 3, H, W) uint8 -> (N, H, W, 3) float32 in [-1, 1]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c, h, w = chunk_u8.shape
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        interpret=interpret,
    )(chunk_u8)


@partial(jax.jit, static_argnames=("use_pallas",))
def _stage(u8, use_pallas):
    if use_pallas:
        return stage_uint8_to_tanh(u8)
    x = u8.astype(jnp.float32)
    return jnp.transpose(2.0 * (x / 255.0) - 1.0, (0, 2, 3, 1))


@partial(jax.jit, static_argnames=("use_pallas",))
def _stage_perm(u8, perm, use_pallas):
    return _stage(jnp.take(u8, perm, axis=0), use_pallas)


def stage_chunk(chunk_u8, perm=None, use_pallas=None):
    """Training-chunk staging, fused into ONE on-device program: gather by
    `perm` + uint8->float32 + [0,255]->[-1,1] + NCHW->NHWC. The host ships
    raw uint8 bytes (4x less host->device traffic than the float32 it
    replaces; reference kept chunks GPU-resident the same way,
    `train_IAN.py:478-484`).

    `perm` is an int index vector (the per-chunk shuffle); None = identity.
    `use_pallas` defaults to True on TPU (the gridded VMEM kernel above),
    False elsewhere (plain jnp, which XLA fuses and GSPMD can shard)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if perm is None:
        return _stage(jnp.asarray(chunk_u8), bool(use_pallas))
    return _stage_perm(jnp.asarray(chunk_u8), jnp.asarray(perm), bool(use_pallas))
