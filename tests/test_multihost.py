"""Multi-host (multi-process) smoke test (VERDICT r2 next #6).

Two jax.distributed CPU processes x 4 virtual devices each form ONE global
(8, 1) mesh and run one fused train step with the batch sharded over the
global 'data' axis; the gradient all-reduce crosses the process boundary.
This is the single-box stand-in for the DCN hook that
`train.py --set parallel.multihost=true` enables
(deepfake_tpu/config.py `parallel.multihost`, train.py jax.distributed
initialize) — previously declared but never exercised anywhere.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_mesh_train_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "scripts", "multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    # the conftest pins a single-process 8-device XLA_FLAGS; the worker
    # appends its own 4-device count (last flag wins in XLA's parser), but
    # scrub ours to be explicit
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process_id", str(i),
             "--num_processes", "2", "--port", str(port),
             "--local_devices", "4"],
            env=env, cwd=root, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=1500)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    lines = []
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
        ok = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert ok, f"no MULTIHOST_OK line:\n{out[-2000:]}\n{err[-2000:]}"
        lines.append(ok[0])

    # both processes computed the SAME loss and post-step parameter checksum:
    # the cross-process psum agreed and the replicated update stayed in sync
    def fields(line):
        m = re.search(r"loss=([\d.eE+-]+) checksum=([\d.eE+-]+)", line)
        return m.group(1), m.group(2)

    assert fields(lines[0]) == fields(lines[1]), lines
