"""Headless Neural Photo Editor engine.

The reference editor keeps its state in module-level globals mutated by Tk
callbacks (`NPE.py:44-104,192-345`). Here the whole edit engine is a
GUI-free `EditSession` so the editor is integration-testable (SURVEY.md
section 4), and any frontend (Tk, web, tests) is a thin shell over it.

TPU-first hot loop: one brush event in the reference costs two GPU round
trips plus a host-side scipy blur (`NPE.py:192-235`). Here the entire
propagation -- patch-RGB gradient -> latent step -> decode -> Gaussian mask
-> composite -- is ONE jitted XLA program (`_paint_step`); the only
host<->device traffic per event is the scalar brush box in and the final
64x64x3 frame out. Latent state stays on-device between events.

Image convention at the session boundary: CHW float32 in [-1, 1] (tanh
range), like the model API. `*_uint8()` helpers convert for display.
"""


import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.api import patch_mask, soft_patch_mask
from npe_tpu.models import get_config
from npe_tpu.ops.filters import gaussian_blur_2d
from npe_tpu.utils.ranges import from_tanh, to_tanh

# Gradient-descent step size for brush strokes (`NPE.py:199`).
PAINT_WEIGHT = 0.05
# Scroll (lighten/darken) step size (`NPE.py:309`).
SCROLL_WEIGHT = 0.1
# Mask blur sigma (`NPE.py:224`).
MASK_SIGMA = 0.7
# Per-stroke user-mask accumulation rate (`NPE.py:221`, commented out there).
USER_MASK_RATE = 0.05


def _soft_box_profile(shape, x1, y1, x2, y2, sigma):
    """Host-side (numpy) twin of api.soft_patch_mask for USER_MASK
    accumulation: hard box when sigma == 0, `gk`-feathered otherwise."""
    h, w = shape
    prof = np.zeros(shape, np.float32)
    prof[y1:y2, x1:x2] = 1.0
    if sigma > 0:
        cols = np.arange(w, dtype=np.float32)[None, :]
        rows = np.arange(h, dtype=np.float32)[:, None]
        dx = np.maximum(np.maximum(x1 - cols, cols - (x2 - 1)), 0.0)
        dy = np.maximum(np.maximum(y1 - rows, rows - (y2 - 1)), 0.0)
        prof = np.exp(-(dx**2 + dy**2) / (2.0 * sigma**2 * h)).astype(np.float32)
    return prof


def _mask_and_composite(xh_hwc, recon_hwc, error_hwc, user_mask=None):
    """DELTA/MASK/composite math per `NPE.py:218-231`:
    DELTA = decode(Z) - RECON;
    MASK  = clip(gaussian_blur(min(mean(|DELTA|, channels), 1), 0.7)
                 + USER_MASK, 0, 1);
    IM    = RECON + MASK*DELTA + (1-MASK)*ERROR.
    USER_MASK is the additive per-pixel floor the reference sketched but
    never wired (`NPE.py:58,221`): strokes accumulate it so user-touched
    regions keep showing the generator's output even where DELTA is small."""
    delta = xh_hwc - recon_hwc
    m = jnp.minimum(jnp.mean(jnp.abs(delta), axis=-1), 1.0)
    mask = gaussian_blur_2d(m, MASK_SIGMA)
    if user_mask is not None:
        mask = jnp.clip(mask + user_mask, 0.0, 1.0)
    mask = mask[:, :, None]
    im = recon_hwc + mask * delta + (1.0 - mask) * error_hwc
    return im, delta, mask[:, :, 0]


class EditSession:
    def __init__(
        self,
        config="IAN_simple",
        variables=None,
        weights_path=None,
        dim=(10, 10),
        seed=42,
        use_pallas="auto",
        dtype=None,
    ):
        """use_pallas: True/False/'auto' -- fuse the DELTA/MASK/composite
        tail into the Pallas VMEM kernel (ops/pallas/editor_kernels.py);
        'auto' enables it on TPU backends only.
        dtype: jnp.bfloat16 runs the decode/grad hot path in the MXU-native
        dtype (composite state stays float32)."""
        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas)
        self.module = get_config(config)
        if variables is None:
            variables = self.module.init(jax.random.PRNGKey(seed))
        if weights_path is not None:
            from npe_tpu.utils import checkpoints

            checkpoints.load_weights(weights_path, variables)
        if dtype is not None:
            from npe_tpu.utils.cast import cast_floating

            variables = cast_floating(variables, dtype)
        self._dtype = dtype or jnp.float32
        self.variables = variables
        self.dim = tuple(dim)
        zdim = self.module.cfg["num_latents"]
        assert self.dim[0] * self.dim[1] == zdim
        mod = self.module

        in_dtype = self._dtype

        def _decode_hwc(v, z_flat):
            return mod.decode(v, z_flat[None].astype(in_dtype))[0].astype(jnp.float32)

        def _rgb_patch_loss(z_flat, v, c1, r1, c2, r2, sigma, rgb_hwc):
            xh = _decode_hwc(v, z_flat)
            m = soft_patch_mask(xh.shape[0], xh.shape[1], c1, r1, c2, r2, sigma, xh.dtype)
            se = (rgb_hwc - xh) ** 2
            return jnp.sum(se * m[:, :, None]) / (jnp.sum(m) * xh.shape[2])

        def _lighten_patch_loss(z_flat, v, c1, r1, c2, r2, sigma):
            xh = _decode_hwc(v, z_flat)
            m = soft_patch_mask(xh.shape[0], xh.shape[1], c1, r1, c2, r2, sigma, xh.dtype)
            return jnp.sum(xh * m[:, :, None]) / (jnp.sum(m) * xh.shape[2])

        if self.use_pallas:
            from npe_tpu.ops.pallas.editor_kernels import edit_tail

            def _tail(xh, recon, error, um):
                return edit_tail(xh, recon, error, um, MASK_SIGMA)
        else:

            def _tail(xh, recon, error, um):
                return _mask_and_composite(xh, recon, error, um)[0]

        @jax.jit
        def _paint_step(v, z, c1, r1, c2, r2, sigma, rgb_hwc, recon, error, um, composite):
            """Full stroke propagation (`NPE.py:192-235`) as one program.
            composite=False reproduces the SAMPLE_FLAG path (latent update +
            decode only). sigma>0 feathers the brush (soft_patch_mask); it is
            a runtime scalar, so brush shape changes never recompile."""
            g = jax.grad(_rgb_patch_loss)(z, v, c1, r1, c2, r2, sigma, rgb_hwc)
            z2 = z - PAINT_WEIGHT * g * (1.0 + (c2 - c1))
            xh = _decode_hwc(v, z2)
            im = jnp.where(composite, _tail(xh, recon, error, um), xh)
            return z2, im, xh

        @jax.jit
        def _scroll_step(v, z, c1, r1, c2, r2, sigma, direction):
            """Lighten/darken patch via gradient ascent (`NPE.py:305-314`)."""
            g = jax.grad(_lighten_patch_loss)(z, v, c1, r1, c2, r2, sigma)
            z2 = z + direction * SCROLL_WEIGHT * g * (1.0 + (c2 - c1))
            return z2, _decode_hwc(v, z2)

        @jax.jit
        def _composite_step(v, z, recon, error, um, composite):
            xh = _decode_hwc(v, z)
            im = jnp.where(composite, _tail(xh, recon, error, um), xh)
            return im, xh

        @jax.jit
        def _encode(v, x_hwc):
            return mod.encode(v, x_hwc[None].astype(in_dtype))[0].astype(jnp.float32)

        self._paint_fn = _paint_step
        self._scroll_fn = _scroll_step
        self._composite_fn = _composite_step
        self._encode_fn = _encode
        self._decode_fn = jax.jit(_decode_hwc)
        self._init_state()

    def _init_state(self):
        h, w = self.module.cfg["dims"]
        zdim = self.module.cfg["num_latents"]
        self.sample_flag = False
        self.Z = jnp.zeros(zdim)
        self._gim = np.zeros((3, h, w), np.float32)  # ground truth, CHW tanh
        self.IM = self._gim.copy()
        self._recon = jnp.zeros((h, w, 3))
        self._error = jnp.zeros((h, w, 3))
        self.DELTA = np.zeros((3, h, w), np.float32)
        self.USER_MASK = np.zeros((h, w), np.float32)
        # Undo stack (reference has none; its only recovery is full Reset,
        # `NPE.py:330-340`). Each edit op pushes a snapshot; undo() pops.
        self._undo = []
        self.undo_depth = 32

    def fork(self):
        """A new session with fresh editor state that SHARES this session's
        weights and compiled programs. Multi-image editing must not pay
        another trace/compile per open image (one big-program compile is
        minutes through a remote TPU tunnel), so the forked session reuses
        every jitted closure; only the per-image state is new."""
        s = object.__new__(EditSession)
        for attr in (
            "use_pallas", "module", "_dtype", "variables", "dim",
            "_paint_fn", "_scroll_fn", "_composite_fn", "_encode_fn", "_decode_fn",
        ):
            setattr(s, attr, getattr(self, attr))
        s._init_state()
        return s

    # --- helpers ------------------------------------------------------------

    @property
    def GIM(self):
        return self._gim

    @property
    def RECON(self):
        return np.asarray(self._recon).transpose(2, 0, 1)

    @property
    def ERROR(self):
        return np.asarray(self._error).transpose(2, 0, 1)

    @property
    def Z_grid(self):
        return np.asarray(self.Z).reshape(self.dim)

    def im_uint8(self):
        return np.uint8(np.clip(from_tanh(self.IM), 0, 255))

    @staticmethod
    def _quantize_tanh(xh_hwc):
        """Reference RECON passes through uint8 (`NPE.py:261`): quantize to
        the uint8 grid but stay in tanh units."""
        return to_tanh(np.float32(np.uint8(np.clip(from_tanh(np.asarray(xh_hwc)), 0, 255))))

    # --- undo ----------------------------------------------------------------

    def _snapshot(self):
        self._undo.append(
            (
                self.Z,
                self.IM.copy(),
                self._recon,
                self._error,
                self.DELTA.copy(),
                self.USER_MASK.copy(),
                self.sample_flag,
            )
        )
        if len(self._undo) > self.undo_depth:
            self._undo.pop(0)

    def undo(self):
        """Revert the most recent edit operation (stroke/scroll/latent-paint/
        sample). Returns the restored image, or None if nothing to undo."""
        if not self._undo:
            return None
        (self.Z, self.IM, self._recon, self._error, self.DELTA,
         self.USER_MASK, self.sample_flag) = self._undo.pop()
        return self.IM

    @property
    def can_undo(self):
        return bool(self._undo)

    # --- operations (reference `NPE.py` callbacks) ---------------------------

    def infer(self, image_chw_tanh):
        """Load a ground-truth image, encode, reconstruct (`NPE.py:239-274`)."""
        self._gim = np.float32(image_chw_tanh)
        self.IM = self._gim.copy()
        x_hwc = jnp.asarray(self._gim.transpose(1, 2, 0))
        self.Z = self._encode_fn(self.variables, x_hwc)
        xh = self._decode_fn(self.variables, self.Z)
        self._recon = jnp.asarray(self._quantize_tanh(xh))
        self._error = x_hwc - self._recon
        self.DELTA = np.zeros_like(self._gim)
        self.USER_MASK = np.zeros_like(self.USER_MASK)
        self.sample_flag = False
        self._undo.clear()
        return self.IM

    def reset(self):
        """Re-encode the ground truth (`NPE.py:330-340`)."""
        return self.infer(self._gim)

    def update_gim(self):
        """Promote the current image to ground truth (`NPE.py:342-345`)."""
        self._gim = np.float32(self.IM)
        return self.reset()

    def sample(self, key_or_seed=0):
        """Z ~ N(0,1), decode (`NPE.py:317-327`)."""
        key = (
            jax.random.PRNGKey(key_or_seed)
            if isinstance(key_or_seed, int)
            else key_or_seed
        )
        self._snapshot()
        self.Z = jax.random.normal(key, self.Z.shape)
        xh = self._decode_fn(self.variables, self.Z)
        self._recon = jnp.asarray(self._quantize_tanh(xh))
        self._error = jnp.asarray(self.IM.transpose(1, 2, 0)) - self._recon
        self.sample_flag = True
        self.IM = np.asarray(xh).transpose(2, 0, 1)
        return self.IM

    def paint_stroke(self, x1, y1, x2, y2, rgb, sigma=0.0):
        """One brush event (`NPE.py:192-235`). rgb: length-3 iterable in
        [0, 255] (the color picker's output, `NPE.py:353-359`). The box is
        [y1, y2) rows x [x1, x2) cols in 64-space. sigma>0 = soft brush: the
        patch loss is feathered by the reference's `gk` Gaussian localizer
        (`NPE.py:167-175`, unwired there)."""
        rgb_hwc = jnp.broadcast_to(
            jnp.asarray(to_tanh(np.float32(rgb))), self._recon.shape
        )
        self._snapshot()
        # Accumulate the user mask under the brush (the reference's sketched
        # `USER_MASK[y1:y2,x1:x2]+=0.05`, `NPE.py:221`); soft strokes
        # accumulate the same feathered profile the loss sees.
        prof = _soft_box_profile(self.USER_MASK.shape, x1, y1, x2, y2, sigma)
        self.USER_MASK = np.minimum(self.USER_MASK + USER_MASK_RATE * prof, 1.0)
        z2, im, xh = self._paint_fn(
            self.variables,
            self.Z,
            x1,
            y1,
            x2,
            y2,
            float(sigma),
            rgb_hwc,
            self._recon,
            self._error,
            jnp.asarray(self.USER_MASK),
            not self.sample_flag,
        )
        self.Z = z2
        self.IM = np.asarray(im).transpose(2, 0, 1)
        self.DELTA = np.asarray(xh - self._recon).transpose(2, 0, 1)
        return self.IM

    def scroll_patch(self, x1, y1, x2, y2, direction, sigma=0.0):
        """Mouse-wheel lighten/darken (`NPE.py:305-314`)."""
        self._snapshot()
        z2, xh = self._scroll_fn(
            self.variables, self.Z, x1, y1, x2, y2, float(sigma), float(np.sign(direction))
        )
        self.Z = z2
        self.IM = np.asarray(xh).transpose(2, 0, 1)
        return self.IM

    def set_latents(self, z_grid):
        """Direct latent painting (`NPE.py:277-302`): caller supplies the
        pooled latent grid; we re-composite."""
        self._snapshot()
        self.Z = jnp.asarray(np.float32(z_grid).reshape(-1))
        im, xh = self._composite_fn(
            self.variables,
            self.Z,
            self._recon,
            self._error,
            jnp.asarray(self.USER_MASK),
            not self.sample_flag,
        )
        self.IM = np.asarray(im).transpose(2, 0, 1)
        return self.IM

    def decode_current(self):
        return np.asarray(self._decode_fn(self.variables, self.Z)).transpose(2, 0, 1)
