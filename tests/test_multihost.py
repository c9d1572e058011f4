"""True 2-process jax.distributed exercise on CPU (VERDICT round 1 item
5): spawn two worker processes, wire them through a coordinator, build a
cross-process mesh, form global arrays from host-local shards, and run a
psum'd SPMD train step.  This is the only offline way to catch
process-index bugs before a pod-slice session (SURVEY.md §4)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_spmd_step():
    # (hang protection lives in communicate(timeout=...) below)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[0][len("RESULT "):]))

    # both processes saw identical global values
    a, b = results
    assert {a["pid"], b["pid"]} == {0, 1}
    # global sum: rows 0..15 + rows (0..15 + 100*1) = 120 + (120 + 1600)
    expected_total = float(np.arange(16).sum() * 2 + 100.0 * 16)
    assert a["total"] == pytest.approx(expected_total)
    assert a["total"] == pytest.approx(b["total"])
    assert a["total_psum"] == pytest.approx(expected_total)
    assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)
    assert np.isfinite(a["loss"])
