"""True 2-process jax.distributed exercise of the REAL training code
(VERDICT round 2 item 3): spawn two worker processes, wire them through a
coordinator into a (8, 1) mesh (4 local devices each), and drive
``spmd.make_spmd_train_step`` (host-local batch slicing) plus
``halo_train.make_halo_train_step`` (ppermute-ring halo layers) for
N_STEPS steps.  The parent process — which owns 8 virtual CPU devices
itself (conftest) — replays the identical run single-process and asserts
both loss trajectories match, catching process-index bugs in the actual
train path before any pod-slice session (SURVEY.md §4)."""

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


@pytest.fixture(scope="module")
def worker_results():
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
            out, err = p.communicate(timeout=300)
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
    return results


@pytest.fixture(scope="module")
def oracle_trajectories():
    """Single-process 8-device run of the same steps on the same data."""
    import jax
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _multihost_common as C
    from mpqe_tpu.parallel import halo_train, mesh as mesh_lib, spmd

    mesh = mesh_lib.make_mesh((8, 1))
    cfg, tc = C.model_config(), C.train_config()
    batches = C.global_batches()

    init_fn, spmd_step = spmd.make_spmd_train_step(
        cfg, tc, mesh, shard_entity_table=True)
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    spmd_losses = []
    for g in batches:
        arrs = {
            k: jax.device_put(
                np.asarray(v),
                rep if k in ("edge_rel", "edge_norm") else batch_sharding)
            for k, v in g.items()
        }
        params, opt_state, loss = spmd_step(
            params, opt_state, C.STRUCT, *[arrs[k] for k in C.BATCH_ORDER])
        spmd_losses.append(float(loss))

    halo_step = halo_train.make_halo_train_step(
        cfg, tc, mesh, layer_kind="ring")
    state = halo_train.init_halo_train_state(
        jax.random.PRNGKey(0), cfg, tc, mesh)
    hp, ho = state.params, state.opt_state
    halo_losses = []
    for g in batches:
        arrs = {k: jax.device_put(np.asarray(v), rep) for k, v in g.items()}
        hp, ho, loss = halo_step(
            hp, ho, C.STRUCT, *[arrs[k] for k in C.BATCH_ORDER])
        halo_losses.append(float(loss))
    return spmd_losses, halo_losses


def test_two_process_agrees_across_processes(worker_results):
    a, b = worker_results
    assert {a["pid"], b["pid"]} == {0, 1}
    assert a["n_proc"] == b["n_proc"] == 2
    np.testing.assert_allclose(a["spmd_losses"], b["spmd_losses"], rtol=1e-6)
    np.testing.assert_allclose(a["halo_losses"], b["halo_losses"], rtol=1e-6)
    assert np.all(np.isfinite(a["spmd_losses"]))
    assert np.all(np.isfinite(a["halo_losses"]))


def test_two_process_spmd_trajectory_matches_single_process(
        worker_results, oracle_trajectories):
    """The REAL GSPMD train step produces the same loss trajectory whether
    the 8-device mesh spans one process or two (host-local batch slicing
    included)."""
    spmd_oracle, _ = oracle_trajectories
    got = worker_results[0]["spmd_losses"]
    assert len(got) == len(spmd_oracle) >= 3
    np.testing.assert_allclose(got, spmd_oracle, rtol=1e-5)


def test_two_process_halo_trajectory_matches_single_process(
        worker_results, oracle_trajectories):
    """The REAL shard_map ppermute-ring halo train step crosses the
    process boundary without changing the trajectory."""
    _, halo_oracle = oracle_trajectories
    got = worker_results[0]["halo_losses"]
    assert len(got) == len(halo_oracle) >= 3
    np.testing.assert_allclose(got, halo_oracle, rtol=1e-5)
