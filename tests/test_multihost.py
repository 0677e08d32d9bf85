"""Two-process distributed execution test (SCALING.md recipe as code).

Launches two real OS processes running tools/run_multihost.py against a
local coordinator, each owning 4 CPU devices of a global 8-device
("views",) mesh, and checks that (a) both succeed, (b) their global
checksums agree with each other and (c) with a single-process run of the
identical scene on this test's local 8-device CPU platform.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_checksum():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _STATIC, _example_inputs
    from line3dpp_tpu.parallel import sharded

    mesh = sharded.make_mesh(8)
    fn = sharded.sharded_forward_step(mesh, **_STATIC)
    placed = sharded.shard_inputs(mesh, *_example_inputs(V=8, S=16, N=2))
    out = fn(*placed)
    return (int(jnp.sum(out.est_valid.astype(jnp.int32))),
            int(jnp.sum(out.aff_valid.astype(jnp.int32))),
            float(jnp.sum(out.aff_weight)))


def test_two_process_sharded_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the subprocesses must NOT inherit the test harness's forced single
    # CPU platform flags; run_multihost.py configures its own backend
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "run_multihost.py"),
             f"--coordinator=127.0.0.1:{port}",
             "--num_processes=2", f"--process_id={pid}",
             "--cpu", "4", "--views", "8"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    sums = []
    for out in outs:
        m = re.search(r"checksum est=(\d+) edges=(\d+) wsum=([\d.eE+-]+)",
                      out)
        assert m, f"no checksum in output:\n{out}"
        sums.append((int(m.group(1)), int(m.group(2)), float(m.group(3))))

    assert sums[0] == sums[1], f"process checksums differ: {sums}"

    ref = _single_process_checksum()
    assert sums[0][0] == ref[0] and sums[0][1] == ref[1], (sums[0], ref)
    np.testing.assert_allclose(sums[0][2], ref[2], rtol=1e-4)
