"""Worker process for the 2-process jax.distributed CPU test.

Usage: python _multihost_worker.py <port> <process_id>

Each of the two processes owns 2 virtual CPU devices (4 global), joins the
coordinator, builds a (4, 1) mesh spanning both processes, contributes its
host-local half of a global batch via multihost.host_local_batch, and runs
one psum'd SPMD train step.  Prints one "RESULT <json>" line; the parent
test asserts both processes produced identical, expected values.
"""

import json
import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mpqe_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.parallel import mesh as mesh_lib, spmd
    from mpqe_tpu.queries import STRUCTURES
    from mpqe_tpu.train import loop as loop_mod

    mesh = mesh_lib.make_mesh((4, 1))

    # 1) host_local_batch: each process contributes rows 0..3 (pid 0) /
    #    4..7 (pid 1) of a global [8, 4] array
    local = (np.arange(16, dtype=np.float32).reshape(4, 4)
             + 100.0 * pid)
    arrs = multihost.host_local_batch(mesh, {"x": local})
    assert arrs["x"].shape == (8, 4)
    total = float(jax.jit(jnp.sum)(arrs["x"]))

    # 2) explicit psum through shard_map across both processes
    f = shard_map(
        lambda a: jax.lax.psum(jnp.sum(a), "data"),
        mesh=mesh, in_specs=P("data", None), out_specs=P(),
        check_vma=False,
    )
    total_psum = float(np.asarray(jax.jit(f)(arrs["x"])).ravel()[0])

    # 3) one SPMD train step on a deterministic global batch (each host
    #    packs its half; loss must match the single-process oracle)
    spec = STRUCTURES["2-chain"]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=64, n_modes=2, n_rels=4, embed_dim=8, n_layers=1,
        num_bases=2, readout="tgt",
    )
    tc = loop_mod.TrainConfig(lr=0.01, batch_size=8, n_neg=2)
    rng = np.random.default_rng(0)  # same global batch on both hosts
    B = 8
    g = dict(
        node_entity=rng.integers(0, 64, (B, spec.n_nodes)).astype(np.int32),
        node_mode=rng.integers(0, 2, (B, spec.n_nodes)).astype(np.int32),
        target=rng.integers(0, 64, (B,)).astype(np.int32),
        negatives=rng.integers(0, 64, (B, 2)).astype(np.int32),
        neg_mask=np.ones((B, 2), np.float32),
        query_mask=np.ones((B,), np.float32),
        edge_rel=rng.integers(0, 4, (spec.n_edges,)).astype(np.int32),
        edge_norm=np.ones((spec.n_edges,), np.float32),
    )
    lo, hi = (0, 4) if pid == 0 else (4, 8)
    local_arrays = {
        k: (v if k in ("edge_rel", "edge_norm") else v[lo:hi])
        for k, v in g.items()
    }
    batch_arrays = multihost.host_local_batch(mesh, local_arrays)

    init_fn, jit_step = spmd.make_spmd_train_step(
        cfg, tc, mesh, shard_entity_table=True)
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    params, opt_state, loss = jit_step(
        params, opt_state, "2-chain",
        batch_arrays["node_entity"], batch_arrays["node_mode"],
        batch_arrays["edge_rel"], batch_arrays["edge_norm"],
        batch_arrays["target"], batch_arrays["negatives"],
        batch_arrays["neg_mask"], batch_arrays["query_mask"],
    )
    print("RESULT " + json.dumps({
        "pid": pid,
        "total": total,
        "total_psum": total_psum,
        "loss": float(loss),
    }), flush=True)


if __name__ == "__main__":
    main()
