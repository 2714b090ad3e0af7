"""Multi-host data parallelism: 2 CPU processes x 4 virtual devices run one
faithful IAN_simple G+D step over a global 8-device mesh (gloo collectives)
and must produce numerics identical to the same step run single-process."""

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


def test_two_process_dp_matches_single_process():
    port = _free_port()
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
                "--local-devices",
                "4",
                "--batch-size",
                "16",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu"},
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    line = next(l for l in outs[0].splitlines() if l.startswith("MULTIHOST_METRICS "))
    multi = json.loads(line[len("MULTIHOST_METRICS "):])

    # single-process reference on this process's 8 virtual devices
    from npe_tpu.parallel.mesh import make_mesh
    from npe_tpu.parallel.multihost import demo_step

    single = demo_step(make_mesh(), batch_size=16)
    assert set(single) == set(multi)
    for k in single:
        np.testing.assert_allclose(multi[k], single[k], rtol=2e-4, atol=2e-5, err_msg=k)
