"""Multi-host data parallelism: 2 CPU processes x 2 virtual devices run one
G+D step (IAN_simple-shaped tiny profile, tests/tiny_ian.py) over a global
4-device mesh (gloo collectives) and must produce numerics identical to the
same step run single-process."""

import json
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(port):
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "npe_tpu.parallel.multihost",
                "--coordinator",
                f"127.0.0.1:{port}",
                "--num-processes",
                "2",
                "--process-id",
                str(i),
                # 2 devices/process, batch 8: DP across hosts is exercised
                # exactly as at larger sizes, but with 4 total device threads
                # on this 1-core box instead of 8 -- halving the scheduling
                # skew that intermittently blows gloo's hardcoded 30 s
                # key-value deadline during first-context creation.
                "--local-devices",
                "2",
                "--batch-size",
                "8",
                # Narrow test profile (same layer names/partitions/code paths
                # as IAN_simple at 1/8 width): cuts each worker's 1-core
                # compile from minutes to seconds without losing coverage --
                # the cross-process collectives are identical.
                "--config",
                "tests/tiny_ian.py",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu"},
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    return [p.returncode for p in procs], outs


# Coordination/gloo setup between two processes sharing one CPU core is
# timing-sensitive; ONLY these signatures in the worker output identify an
# infrastructure (not correctness) failure and justify one retry.
_INFRA_SIGNATURES = (
    "DEADLINE_EXCEEDED",
    "GetKeyValue",
    "KeyValueGet",
    "barrier timed out",
    "Barrier timed out",
    "timed out waiting",
    "connection refused",
    "Connection refused",
)


def test_two_process_dp_matches_single_process():
    rcs, outs = _run_workers(_free_port())
    if any(rcs):
        # Retry ONCE, and only on a recognized coordination/gloo-setup
        # signature -- a genuine crash (e.g. a collective SIGABRT) must fail
        # immediately rather than pass on a lucky second attempt. A numerics
        # mismatch (below) never retries either way.
        print(f"first attempt rcs={rcs}\n--- worker0:\n{outs[0][-3000:]}\n--- worker1:\n{outs[1][-3000:]}")
        infra = any(sig in out for out in outs for sig in _INFRA_SIGNATURES)
        assert infra, (
            f"non-infrastructure worker failure (no retry): rcs={rcs}\n"
            f"worker0:\n{outs[0][-3000:]}\nworker1:\n{outs[1][-3000:]}"
        )
        rcs, outs = _run_workers(_free_port())
    assert rcs == [0, 0], f"worker0:\n{outs[0][-3000:]}\nworker1:\n{outs[1][-3000:]}"
    line = next(l for l in outs[0].splitlines() if l.startswith("MULTIHOST_METRICS "))
    multi = json.loads(line[len("MULTIHOST_METRICS "):])

    # single-process reference on this process's 8 virtual devices
    from npe_tpu.parallel.mesh import make_mesh
    from npe_tpu.parallel.multihost import demo_step

    single = demo_step(make_mesh(), batch_size=8, config="tests/tiny_ian.py")
    assert set(single) == set(multi)
    for k in single:
        # rtol 5e-4: f32 reduction-order noise between the gloo cross-process
        # all-reduce and the single-process one (observed up to 2.5e-4 on the
        # CE losses, whose saturated logits amplify it).
        np.testing.assert_allclose(multi[k], single[k], rtol=5e-4, atol=5e-5, err_msg=k)
