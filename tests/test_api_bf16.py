"""bf16 inference path + user config-file loading."""

import numpy as np
import pytest


def test_bf16_api_close_to_f32():
    import jax.numpy as jnp

    from npe_tpu.api import IAN

    m32 = IAN(config_path="IAN_simple", seed=0)
    m16 = IAN(config_path="IAN_simple", seed=0, dtype=jnp.bfloat16)
    z = np.random.RandomState(0).randn(2, 100).astype(np.float32)
    x32 = m32.sample_at(z)
    x16 = m16.sample_at(z)
    assert x16.dtype == np.float32
    # bf16 has ~3 decimal digits; outputs are in [-1,1]
    assert np.mean(np.abs(x32 - x16)) < 0.05


def test_user_config_file(tmp_path):
    from npe_tpu.models import get_config

    cfg_file = tmp_path / "my_ian.py"
    cfg_file.write_text(
        "from npe_tpu.models.ian_simple import *  # noqa\n"
        "from npe_tpu.models.ian_simple import cfg as _base\n"
        "cfg = dict(_base, batch_size=4)\n"
    )
    mod = get_config(str(cfg_file))
    assert mod.cfg["batch_size"] == 4
    assert callable(mod.init)

    with pytest.raises(KeyError):
        get_config(str(tmp_path / "missing.py"))
