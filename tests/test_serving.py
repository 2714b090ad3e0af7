"""Micro-batching inference server tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    from npe_tpu.serving import InferenceServer

    s = InferenceServer(config="IAN_simple", max_batch=8, linger_ms=5.0, seed=0)
    yield s
    s.close()


def test_roundtrip_matches_direct(server):
    import jax

    x = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32) * 2 - 1
    z = server.encode(x).result(timeout=120)
    assert z.shape == (3, 100)
    direct = np.asarray(server.module.encode(server.variables, x))
    np.testing.assert_allclose(z, direct, rtol=1e-4, atol=1e-5)
    imgs = server.decode(z).result(timeout=120)
    assert imgs.shape == (3, 64, 64, 3)


def test_concurrent_requests_batched(server):
    rng = np.random.RandomState(1)
    futs = [server.decode(rng.randn(2, 100).astype(np.float32)) for _ in range(6)]
    outs = [f.result(timeout=120) for f in futs]
    assert all(o.shape == (2, 64, 64, 3) for o in outs)
    # different inputs -> different outputs
    assert not np.allclose(outs[0], outs[1])


def test_oversize_group_split(server):
    z = np.random.RandomState(2).randn(20, 100).astype(np.float32)  # > max_batch
    out = server.decode(z).result(timeout=240)
    assert out.shape == (20, 64, 64, 3)
    direct = np.asarray(server.module.decode(server.variables, z[:2]))
    np.testing.assert_allclose(out[:2], direct, rtol=1e-3, atol=1e-4)
