"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_data_parallel_step_matches_single_device():
    """A DP-sharded gen step must produce the same losses and (numerically
    close) parameter updates as the unsharded step on the same batch --
    i.e. GSPMD's gradient all-reduce implements the same global batch."""
    from npe_tpu.models import get_config
    from npe_tpu.training import train_step as TS

    m = get_config("IAN_simple")
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (8, 100))
    rng = jax.random.PRNGKey(3)

    gen_step, _ = TS.make_train_steps(m, cfg, donate=False)

    s_single = TS.init_train_state(m, v, cfg)
    s_single, m_single = gen_step(s_single, x, z, rng, 2e-4)

    from npe_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state

    mesh = make_mesh(shape=(8, 1))
    s_shard = shard_train_state(TS.init_train_state(m, v, cfg), mesh)
    s_shard, m_shard = gen_step(s_shard, shard_batch(x, mesh), shard_batch(z, mesh), rng, 2e-4)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )
    # Adam's first step is +-lr * sign(grad); near-zero grads can flip sign
    # under reduction-order noise, moving a weight by up to 2*lr -- allow
    # that (atol 2*lr) but nothing larger.
    w_a = np.asarray(s_single["parts"]["gen"]["dec_out.W"])
    w_b = np.asarray(s_shard["parts"]["gen"]["dec_out.W"])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-2, atol=2 * 2e-4 + 1e-6)


def test_ian_sharded_decode_matches_single_device():
    """TP+DP sharded full-IAN inference (MDCL coefficient tensors, MADE/IAF
    latent path, packed RGB-Beta head) must match single-device numerics
    under GSPMD -- the custom-VJP kernels' XLA fallbacks included."""
    from npe_tpu.models import get_config

    m = get_config("IAN")
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3)) * 0.5

    f = jax.jit(lambda vv, xx: m.decode(vv, m.encode(vv, xx)))
    ref = np.asarray(f(v, x))

    mesh = make_mesh(shape=(4, 2))
    out = np.asarray(f(shard_variables(v, mesh), shard_batch(x, mesh)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_ian_data_parallel_step_matches_single_device():
    """Full-IAN G and D steps under a DP mesh: losses match the unsharded
    step, the frozen-MADE partition stays bit-identical (it must not train,
    `train_IAN.py:194` excludes IAF params), and updated params agree within
    Adam sign-noise tolerance."""
    from npe_tpu.models import get_config
    from npe_tpu.parallel.mesh import shard_train_state
    from npe_tpu.training import train_step as TS

    m = get_config("IAN")
    cfg = dict(m.cfg)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (8, 100))
    rng = jax.random.PRNGKey(3)
    lr = 2e-4

    gen_step, discrim_step = TS.make_train_steps(m, cfg, donate=False)

    s_single = TS.init_train_state(m, v, cfg)
    s_single, mg_single = gen_step(s_single, x, z, rng, lr)
    jax.block_until_ready(mg_single)
    s_single, md_single = discrim_step(s_single, x, z, jax.random.fold_in(rng, 1), lr)
    jax.block_until_ready(md_single)

    frozen0 = {k: np.asarray(a) for k, a in TS.init_train_state(m, v, cfg)["parts"]["frozen"].items()}
    assert frozen0, "full IAN must have a frozen MADE partition"

    mesh = make_mesh(shape=(8, 1))
    s_shard = shard_train_state(TS.init_train_state(m, v, cfg), mesh)
    s_shard, mg_shard = gen_step(s_shard, shard_batch(x, mesh), shard_batch(z, mesh), rng, lr)
    jax.block_until_ready(mg_shard)
    s_shard, md_shard = discrim_step(
        s_shard, shard_batch(x, mesh), shard_batch(z, mesh), jax.random.fold_in(rng, 1), lr
    )
    jax.block_until_ready(md_shard)

    for single, shard in ((mg_single, mg_shard), (md_single, md_shard)):
        for k in single:
            np.testing.assert_allclose(
                float(single[k]), float(shard[k]), rtol=5e-3, atol=5e-4, err_msg=k
            )
    # frozen MADE: bit-identical to init on BOTH paths
    for k, a0 in frozen0.items():
        np.testing.assert_array_equal(np.asarray(s_single["parts"]["frozen"][k]), a0, err_msg=k)
        np.testing.assert_array_equal(np.asarray(s_shard["parts"]["frozen"][k]), a0, err_msg=k)
    # a decoder weight and a latent-head weight agree within Adam sign-noise
    for part, key in (("gen", "dec_conv2.W"), ("latent", "enc_mu.W")):
        np.testing.assert_allclose(
            np.asarray(s_single["parts"][part][key]),
            np.asarray(s_shard["parts"][part][key]),
            rtol=1e-2,
            atol=2 * 2 * lr + 1e-6,
            err_msg=f"{part}/{key}",
        )


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
