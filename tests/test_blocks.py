"""Library-extra blocks (USL/DSL/inception/ResLayer) + eval/profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.models.common import VarBuilder
from npe_tpu.ops.blocks import (
    dsl_apply,
    dsl_init,
    inception_apply,
    inception_init,
    pd,
    res_layer,
    usl_apply,
    usl_init,
)
from npe_tpu.ops.activations import elu, relu


def test_usl_upsamples_2x():
    vb = VarBuilder(jax.random.PRNGKey(0))
    usl_init(vb, "usl", 6, 4, [0, 2])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    y = usl_apply(vb.v, "usl", x, [0, 2])
    assert y.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_dsl_downsamples_2x():
    vb = VarBuilder(jax.random.PRNGKey(0))
    dsl_init(vb, "dsl", 6, 4, [0, 2])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    y = dsl_apply(vb.v, "dsl", x, [0, 2])
    assert y.shape == (2, 4, 4, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_res_layer():
    x = jnp.array([-1.0, 2.0])
    out = res_layer(x, jnp.array([0.5, -3.0]), relu)
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0])


def test_pd_broadcasts():
    d = pd(num_layers=3, num_filters=[8, 8, 16], filter_size=3)
    assert d["num_filters"] == [8, 8, 16]
    assert d["filter_size"] == [3, 3, 3]
    assert len(d["style"]) == 3


def test_inception_block():
    dicts = [
        pd(num_layers=2, num_filters=8, filter_size=3, pad=1, stride=1, bnorm=1),
        pd(num_layers=1, num_filters=4, filter_size=1, pad=0, stride=1, bnorm=0),
    ]
    vb = VarBuilder(jax.random.PRNGKey(0))
    inception_init(vb, "inc", 6, dicts)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    upd = {}
    y = inception_apply(vb.v, upd, "inc", x, dicts, train=True)
    assert y.shape == (2, 8, 8, 12)  # 8 + 4 channels concat
    assert any(k.startswith("inc_bnorm") for k in upd)


def test_gaussian_nll_pixel():
    from npe_tpu.training.losses import gaussian_nll_pixel

    x = jnp.zeros((2, 4, 4, 3))
    # perfect recon, log_sigma=0 -> 0.5*log(2*pi)
    val = float(gaussian_nll_pixel(x, x, jnp.zeros((4, 4, 3))))
    np.testing.assert_allclose(val, 0.5 * np.log(2 * np.pi), rtol=1e-6)


def test_validation_pixel_accuracy():
    from npe_tpu.data import SyntheticFaces
    from npe_tpu.models import get_config
    from npe_tpu.training.evaluate import validation_pixel_accuracy

    m = get_config("IAN_simple")
    v = m.init(jax.random.PRNGKey(0))
    cfg = dict(m.cfg)
    cfg.update(batch_size=4, batches_per_chunk=2)
    ds = SyntheticFaces(num_examples=16)
    out = validation_pixel_accuracy(m, v, ds, cfg, max_chunks=1)
    assert 0.0 <= out["mse"] <= 4.0
    assert np.isfinite(out["test_error"])


def test_step_timer():
    from npe_tpu.utils.profiling import StepTimer

    t = StepTimer("edit")
    for _ in range(5):
        with t.time():
            pass
    s = t.summary()
    assert s["edit_count"] == 5
    assert s["edit_ms_p50"] >= 0
