"""Plat-style inference API -- the 5-method contract the NPE consumes
(reference `API.py`, adopted from dribnet/plat).

Differences from the reference, by design:
  * Each method is ONE jitted XLA program compiled once per shape. The brush
    rectangle (c1, r1, c2, r2) is a *runtime* argument -- patch means are
    computed with an iota-built mask instead of dynamic slicing, so moving or
    resizing the brush never recompiles (the reference compiled Theano
    functions with symbolic int slices, `API.py:54-64`).
  * Image tensors cross this boundary in the reference's NCHW float32 [-1,1]
    layout; internally everything is NHWC for the TPU.
"""


import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.models import get_config
from npe_tpu.utils import checkpoints


def patch_mask(h, w, c1, r1, c2, r2, dtype=jnp.float32):
    """(h, w) mask of the half-open box [r1, r2) x [c1, c2); traceable."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = (rows >= r1) & (rows < r2) & (cols >= c1) & (cols < c2)
    return m.astype(dtype)


def soft_patch_mask(h, w, c1, r1, c2, r2, sigma, dtype=jnp.float32):
    """Gaussian-feathered brush box (the reference's `gk` localizer,
    `NPE.py:167-175`, shipped but left unwired there): 1 inside the box,
    exp(-(dx^2 + dy^2) / (2 sigma^2 im)) outside, where dx/dy are the signed
    pixel distances past the box edges. sigma is a RUNTIME scalar (no
    per-value recompiles); sigma == 0 reproduces the hard box exactly."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
    # distance outside the box per axis (0 inside), per the reference's
    # [-c1..0, zeros, 1..im-c2] coordinate ramps
    dx = jnp.maximum(jnp.maximum(c1 - cols, cols - (c2 - 1)), 0.0)
    dy = jnp.maximum(jnp.maximum(r1 - rows, rows - (r2 - 1)), 0.0)
    sig = jnp.maximum(jnp.asarray(sigma, dtype), 1e-6)  # keep exp() finite
    soft = jnp.exp(-(dx**2 + dy**2) / (2.0 * sig**2 * h))
    hard = patch_mask(h, w, c1, r1, c2, r2, dtype)
    return jnp.where(jnp.asarray(sigma, dtype) > 0, soft, hard)


class IAN:
    """Generic class for using IAN-style models with the NPE
    (reference `API.py:11-110`)."""

    def __init__(
        self, config_path="IAN_simple", variables=None, weights_path=None, seed=42, dtype=None
    ):
        """dtype: pass jnp.bfloat16 to run the whole inference path in the
        MXU-native dtype (params cast once; inputs cast at the boundary,
        outputs returned float32)."""
        self.module = get_config(config_path)
        self.cfg = self.module.cfg
        if variables is None:
            variables = self.module.init(jax.random.PRNGKey(seed))
        if weights_path is not None:
            checkpoints.load_weights(weights_path, variables)
        if dtype is not None:
            from npe_tpu.utils.cast import cast_floating

            variables = cast_floating(variables, dtype)
        self.dtype = dtype
        self.variables = variables
        mod = self.module

        in_dtype = dtype or jnp.float32

        @jax.jit
        def _encode(v, x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(in_dtype)
            return mod.encode(v, x).astype(jnp.float32)

        @jax.jit
        def _decode(v, z):
            out = mod.decode(v, z.astype(in_dtype))
            return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)

        def _lighten_loss(z, v, c1, r1, c2, r2):
            xh = mod.decode(v, z)  # (1, H, W, C)
            m = patch_mask(xh.shape[1], xh.shape[2], c1, r1, c2, r2, xh.dtype)
            # mean of X_hat[0, :, r1:r2, c1:c2] (reference `API.py:59`)
            return jnp.sum(xh[0] * m[:, :, None]) / (jnp.sum(m) * xh.shape[3])

        def _rgb_loss(z, v, c1, r1, c2, r2, rgb_nchw):
            xh = mod.decode(v, z)
            m = patch_mask(xh.shape[1], xh.shape[2], c1, r1, c2, r2, xh.dtype)
            rgb = jnp.transpose(rgb_nchw, (0, 2, 3, 1))
            # mean((RGB - X_hat)^2 over the patch) (reference `API.py:64`)
            se = (rgb[0] - xh[0]) ** 2
            return jnp.sum(se * m[:, :, None]) / (jnp.sum(m) * xh.shape[3])

        self._imgrad = jax.jit(jax.grad(_lighten_loss))
        self._imgrad_rgb = jax.jit(jax.grad(_rgb_loss))
        self._encode_fn = _encode
        self._decode_fn = _decode

    # --- plat contract -----------------------------------------------------

    def encode_images(self, images):
        """images: (n, 3, s, s) in [-1, 1] -> (n, zdim)."""
        return np.asarray(self._encode_fn(self.variables, jnp.asarray(images)))

    def sample_at(self, z):
        """z: (n, zdim) -> images (n, 3, s, s) in [-1, 1]."""
        return np.asarray(self._decode_fn(self.variables, jnp.asarray(z)))

    def imgrad(self, c1, r1, c2, r2, z):
        """dZ that lightens the local patch (reference `API.py:66-70`)."""
        return np.asarray(self._imgrad(jnp.asarray(z), self.variables, c1, r1, c2, r2))

    def imgradRGB(self, c1, r1, c2, r2, RGB, z):
        """dZ that moves the local patch toward RGB (reference `API.py:72-76`)."""
        return np.asarray(
            self._imgrad_rgb(jnp.asarray(z), self.variables, c1, r1, c2, r2, jnp.asarray(RGB))
        )

    def get_zdim(self):
        return self.cfg["num_latents"]
