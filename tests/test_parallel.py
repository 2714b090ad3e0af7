"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_tpu.parallel.mesh import make_mesh, param_spec, shard_batch, shard_variables


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("enc_conv4.W", np.zeros((5, 5, 512, 1024))) == P(None, None, None, "model")
    assert param_spec("enc_conv1.W", np.zeros((5, 5, 3, 128))) == P()
    assert param_spec("l_dec_fc2.W", np.zeros((100, 16384))) == P(None, "model")
    assert param_spec("enc_fc1.W", np.zeros((16384, 1000))) == P()
    assert param_spec("bnorm2.beta", np.zeros(256)) == P()


def test_sharded_encode_decode_matches_single_device():
    """DP+TP sharded inference must match single-device numerics."""
    from npe_tpu.models import get_config

    m = get_config("IAN_simple")
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3)) * 0.5

    f = jax.jit(lambda vv, xx: m.decode(vv, m.encode(vv, xx)))
    ref = np.asarray(f(v, x))

    mesh = make_mesh(shape=(4, 2))
    v_sh = shard_variables(v, mesh)
    x_sh = shard_batch(x, mesh)
    out = np.asarray(f(v_sh, x_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation path must compile and run."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 64, 64, 3)
