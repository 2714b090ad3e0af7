"""Full-IAN training-step test: exercises the MDBLOCK decoder, RGB-Beta
head, ternary softmax loss, orthogonal regularizer, and the frozen
randomized IAF inside one jitted G and D step (tiny batch)."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.models import get_config
from npe_tpu.training import train_step as TS


import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", ["IAN", "IANv1"])
def test_ian_full_gen_and_discrim_step(name):
    m = get_config(name)
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(m, v, cfg)
    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 100))

    iaf_before = {k: np.asarray(val) for k, val in state["parts"]["frozen"].items()}
    s1, mg = gen_step(state, x, z, jax.random.PRNGKey(3), 2e-4)
    s2, md = discrim_step(s1, x, z, jax.random.PRNGKey(4), 2e-4)

    for k, val in mg.items():
        assert np.isfinite(float(val)), ("gen", k)
    for k, val in md.items():
        assert np.isfinite(float(val)), ("discrim", k)
    # ternary accuracy in [0, 1]
    assert 0.0 <= float(md["discrim_acc"]) <= 1.0
    # the randomized IAF stays frozen through both steps
    for k, before in iaf_before.items():
        np.testing.assert_array_equal(np.asarray(s2["parts"]["frozen"][k]), before)
    # decoder moved on the gen step (MDCL shared filter for IAN, the
    # RGB-Beta head's MDCL for IANv1)
    probe = "dec_conv2aW" if name == "IAN" else "RW"
    assert not np.allclose(
        np.asarray(s1["parts"]["gen"][probe]),
        np.asarray(state["parts"]["gen"][probe]),
    )
