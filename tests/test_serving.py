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


def test_mixed_ops_all_resolve(server):
    """Interleaved encode/decode requests all complete (the op-switch parks
    the request at the FRONT of the pending deque -- no starvation behind
    newer arrivals)."""
    rng = np.random.RandomState(3)
    futs = []
    for i in range(8):
        if i % 2:
            futs.append(("d", server.decode(rng.randn(1, 100).astype(np.float32))))
        else:
            futs.append(("e", server.encode(rng.rand(1, 64, 64, 3).astype(np.float32))))
    for kind, f in futs:
        out = f.result(timeout=240)
        assert out.shape == ((1, 100) if kind == "e" else (1, 64, 64, 3))


def test_request_timeout():
    """A request whose deadline passes while queued fails with TimeoutError
    instead of occupying batch slots."""
    import time

    from npe_tpu.serving import InferenceServer

    s = InferenceServer(config="IAN_simple", max_batch=4, linger_ms=1.0, seed=0)
    try:
        # prime compile so the blocker below isn't just compile time
        s.decode(np.zeros((1, 100), np.float32)).result(timeout=300)
        blocker = s.decode(np.zeros((4, 100), np.float32))
        doomed = s.decode(np.zeros((1, 100), np.float32), timeout=1e-4)
        time.sleep(0.05)
        with pytest.raises(TimeoutError):
            doomed.result(timeout=120)
        blocker.result(timeout=120)
    finally:
        s.close()


def test_kernel_error_propagates(server):
    """A bad input shape fails THAT request's future; the server survives."""
    bad = server.decode(np.zeros((2, 7), np.float32))  # wrong latent width
    with pytest.raises(Exception):
        bad.result(timeout=240)
    ok = server.decode(np.zeros((2, 100), np.float32)).result(timeout=240)
    assert ok.shape == (2, 64, 64, 3)


def test_http_transport():
    """JSON-over-HTTP round trip against the in-process server."""
    import json
    import threading
    import urllib.request

    from npe_tpu.serving import InferenceServer, serve_http

    s = InferenceServer(config="IAN_simple", max_batch=4, linger_ms=1.0, seed=0)
    httpd = serve_http(s, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"] is True
        z = np.random.RandomState(4).randn(2, 100).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/decode",
            data=json.dumps({"data": z.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.asarray(json.load(r)["result"], np.float32)
        assert out.shape == (2, 64, 64, 3)
        direct = np.asarray(s.module.decode(s.variables, z))
        np.testing.assert_allclose(out, direct, rtol=1e-3, atol=1e-4)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] >= 1 and stats["batches"] >= 1
    finally:
        httpd.shutdown()
        s.close()


def test_slo_shortens_linger():
    """A tight-SLO request dispatches well before the linger window expires;
    requests without an SLO still aggregate into one batch."""
    import time

    from npe_tpu.serving import InferenceServer

    s = InferenceServer(config="tests/tiny_ian.py", max_batch=8, linger_ms=4000.0, seed=0)
    try:
        # two warm calls: the first (compile-bound) is discarded, the second
        # seeds the kernel-time EMA the SLO cap needs
        s.decode(np.zeros((1, 16), np.float32)).result(timeout=600)
        s.decode(np.zeros((1, 16), np.float32)).result(timeout=600)
        t0 = time.perf_counter()
        out = s.decode(np.zeros((1, 16), np.float32), slo=0.3).result(timeout=600)
        dt = time.perf_counter() - t0
        assert out.shape == (1, 64, 64, 3)
        # the 4 s linger alone would exceed this; the SLO preempted it
        assert dt < 3.0, dt
        assert s.stats["slo_tightened"] >= 1
        # no-SLO pair submitted back-to-back -> ONE batch (full linger)
        b0 = s.stats["batches"]
        f1 = s.decode(np.zeros((1, 16), np.float32))
        f2 = s.decode(np.zeros((1, 16), np.float32))
        f1.result(timeout=600)
        f2.result(timeout=600)
        assert s.stats["batches"] == b0 + 1
    finally:
        s.close()


def test_multi_model_host_http():
    """Two models in one process: per-model routes, default route, /models
    listing, per-model stats, 404 on unknown model."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from npe_tpu.serving import InferenceServer, ModelHost, serve_http

    host = ModelHost()
    host.add("a", InferenceServer(config="tests/tiny_ian.py", max_batch=4, linger_ms=1.0, seed=0))
    host.add("b", InferenceServer(config="tests/tiny_ian.py", max_batch=4, linger_ms=1.0, seed=1))
    httpd = serve_http(host, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return np.asarray(json.load(r)["result"], np.float32)

    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/models", timeout=30) as r:
            models = json.load(r)
        assert models == {"models": ["a", "b"], "default": "a"}

        z = np.random.RandomState(5).randn(2, 16).astype(np.float32).tolist()
        out_a = post("/a/decode", {"data": z, "slo_ms": 50.0})
        out_b = post("/b/decode", {"data": z})
        out_default = post("/decode", {"data": z})
        assert out_a.shape == out_b.shape == (2, 64, 64, 3)
        assert not np.allclose(out_a, out_b)  # different weights
        np.testing.assert_allclose(out_default, out_a, rtol=1e-5, atol=1e-6)

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/nope/decode", {"data": z})
        assert ei.value.code == 404

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.load(r)
        assert set(stats) == {"a", "b"} and stats["a"]["requests"] >= 2
    finally:
        httpd.shutdown()
        host.close()


def test_uint8_wire_roundtrip():
    """wire='uint8' ships image payloads as uint8 but keeps the float32
    [-1,1] public API. For inputs already on the uint8 grid the encode path
    is LOSSLESS vs the f32 wire; decode output equals the direct decode
    quantized to the grid (max error one 1/255 step of the range)."""
    from npe_tpu.serving import InferenceServer
    from npe_tpu.utils.ranges import from_tanh, to_tanh

    s = InferenceServer(config="IAN_simple", max_batch=4, linger_ms=2.0, seed=0, wire="uint8")
    try:
        rng = np.random.RandomState(7)
        u8 = rng.randint(0, 256, size=(3, 64, 64, 3)).astype(np.uint8)
        x = to_tanh(np.float32(u8))  # grid-aligned client input

        z = s.encode(x).result(timeout=120)
        direct_z = np.asarray(s.module.encode(s.variables, x))
        np.testing.assert_allclose(z, direct_z, rtol=1e-4, atol=1e-5)

        imgs = s.decode(z).result(timeout=120)
        assert imgs.dtype == np.float32 and imgs.shape == (3, 64, 64, 3)
        direct_y = np.asarray(s.module.decode(s.variables, z))
        # equals the host-side quantization of the direct result ...
        expect = to_tanh(np.float32(np.clip(np.round(from_tanh(direct_y)), 0, 255)))
        np.testing.assert_allclose(imgs, expect, rtol=0, atol=1e-6)
        # ... which is within one quantization step of the raw decode
        assert np.max(np.abs(imgs - direct_y)) <= 2.0 / 255.0 + 1e-6
        # and the wire really was uint8-sized payloads end to end
        assert s.wire == "uint8"
    finally:
        s.close()


def test_uint8_wire_tail_padding_and_split():
    """uint8 wire with a padded tail and an oversize group behaves like f32."""
    from npe_tpu.serving import InferenceServer

    s = InferenceServer(config="IAN_simple", max_batch=4, linger_ms=2.0, seed=0, wire="uint8")
    try:
        z = np.random.RandomState(8).randn(10, 100).astype(np.float32)  # > max_batch
        out = s.decode(z).result(timeout=240)
        assert out.shape == (10, 64, 64, 3)
        direct = np.asarray(s.module.decode(s.variables, z[:3]))
        assert np.max(np.abs(out[:3] - direct)) <= 2.0 / 255.0 + 1e-6
    finally:
        s.close()


def test_uint8_wire_accepts_raw_uint8_input():
    """A uint8 [0,255] image array is accepted as-is (zero-conversion fast
    path) and yields exactly the same z as the equivalent float32 input."""
    from npe_tpu.serving import InferenceServer
    from npe_tpu.utils.ranges import to_tanh

    s = InferenceServer(config="IAN_simple", max_batch=4, linger_ms=2.0, seed=0, wire="uint8")
    try:
        u8 = np.random.RandomState(9).randint(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
        z_u8 = s.encode(u8).result(timeout=120)
        z_f32 = s.encode(to_tanh(np.float32(u8))).result(timeout=120)
        np.testing.assert_array_equal(z_u8, z_f32)
    finally:
        s.close()
