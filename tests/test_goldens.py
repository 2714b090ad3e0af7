"""Golden-activation regression tests (SURVEY.md section 4): seed-0 models'
encode/decode outputs on a fixed input, recorded once (CPU f32) and pinned.
Any numerics-changing refactor of the ops or models trips these."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "encode_decode_seed0.npz")


@pytest.mark.parametrize("name", ["IAN_simple", "IAN", "IANv1"])
def test_encode_decode_matches_golden(name):
    from npe_tpu.models import REGISTRY

    with np.load(GOLDENS) as f:
        x = f["x"]
        z_gold = f[f"{name}_z"]
        xh_gold = f[f"{name}_xh"]
    m = REGISTRY[name]
    v = m.init(jax.random.PRNGKey(0))
    z = np.asarray(m.encode(v, x))
    xh = np.asarray(m.decode(v, np.asarray(z_gold)))
    np.testing.assert_allclose(z, z_gold, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(xh, xh_gold, rtol=1e-3, atol=1e-4)
