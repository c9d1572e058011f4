#!/usr/bin/env python
"""Scaling-efficiency benchmark: edges/s of the edge-partitioned R-GCN
layer across mesh sizes (BASELINE.md target: >=80% efficiency 1 chip ->
1 host -> N hosts).

On real multi-chip hardware this measures true ICI scaling; on a single
host it runs on the forced-host-device CPU mesh (validates the harness
and the partitioning overheads, not ICI bandwidth).  Prints one JSON line
per mesh size plus a summary line with parallel efficiency vs. the
1-device run.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --devices 1 2 4 8 --edges 200000
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.ops.edge_store import build_edge_store
from mpqe_tpu.parallel import halo, mesh as mesh_lib
from mpqe_tpu.utils import profiling


def bench_mesh(n_dev, n_nodes, n_e, n_rels, d, num_bases, layer="allgather"):
    rng = np.random.default_rng(0)
    src = rng.integers(0, n_nodes, n_e).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_e).astype(np.int32)
    rel = rng.integers(0, n_rels, n_e).astype(np.int32)
    st = build_edge_store(src, dst, rel, n_nodes, n_rels)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(0), d, d, n_rels, num_bases)
    x = rng.normal(size=(n_nodes, d)).astype(np.float32)

    mesh = mesh_lib.make_mesh((n_dev, 1), devices=jax.devices()[:n_dev])
    if layer == "ring":
        pe = halo.partition_edges_ring(st, n_parts=n_dev)
        x_pad_np = np.zeros((pe.n_nodes_padded, d), np.float32)
        x_pad_np[: st.n_nodes] = x
        x_pad = jnp.asarray(x_pad_np)
        args = (jnp.asarray(pe.src_local), jnp.asarray(pe.dst_local),
                jnp.asarray(pe.rel), jnp.asarray(pe.norm))
        layer_fn = halo.rgcn_ring_halo
    else:
        pe = halo.partition_edges_by_dst(st, n_parts=n_dev)
        x_pad = jnp.asarray(halo.pad_node_features(x, pe))
        args = (jnp.asarray(pe.src), jnp.asarray(pe.dst_local),
                jnp.asarray(pe.rel), jnp.asarray(pe.norm))
        layer_fn = halo.rgcn_dst_partitioned

    @jax.jit
    def loop(x0, n):
        def body(i, carry):
            xx, acc = carry
            out = layer_fn(mesh, p, xx, *args, n_rels)
            return xx + out * 1e-20, acc + out[0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (x0, 0.0))
        return acc

    dt = profiling.loop_time(lambda n: loop(x_pad, n))
    return {"devices": n_dev, "seconds_per_layer": dt, "edges_per_s": n_e / dt}


def bench_rank_mesh(n_dev, n_entities, batch, d):
    """Sharded full-ranking sweep (parallel/rank_shard) across a
    model-axis mesh: ranked queries/s.  The per-device score matrix is
    [B, N/n_dev], so the sweep SCALES table capacity with the mesh —
    the pod-slice eval configuration for tables that exceed one chip."""
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.parallel import rank_shard

    rng = np.random.default_rng(0)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=n_entities, n_modes=4, n_rels=8, embed_dim=d,
        n_layers=1, readout="tgt")
    mesh = mesh_lib.make_mesh((1, n_dev), devices=jax.devices()[:n_dev])
    ent = jnp.asarray(rng.normal(size=(n_entities, d)).astype(np.float32))
    mode = jnp.asarray(rng.integers(0, 4, n_entities).astype(np.int32))
    ent_s, mode_s, _ = rank_shard.shard_table(mesh, ent, mode)
    q = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, n_entities, batch).astype(np.int32))
    fn = rank_shard.make_sharded_rank_fn(mesh, cfg)

    # the sharded table rides as an ARGUMENT: a closure capture would
    # bake it into the executable as a replicated HLO constant —
    # overflowing the relay compile request at the >1-chip table sizes
    # this benchmark exists for, and defeating the row-sharding it
    # measures (CLAUDE.md closure-capture rule)
    @jax.jit
    def loop(ent_s, mode_s, tgt, q0, n):
        def body(i, carry):
            qq, acc = carry
            r = fn(ent_s, mode_s, qq, tgt)
            return qq + r[:1].astype(qq.dtype) * 1e-20, acc + r[0]
        _, acc = jax.lax.fori_loop(0, n, body, (q0, jnp.int32(0)))
        return acc

    dt = profiling.loop_time(lambda n: loop(ent_s, mode_s, tgt, q, n))
    return {"devices": n_dev, "seconds_per_sweep": dt,
            "ranked_queries_per_s": batch / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--nodes", type=int, default=32_768)
    ap.add_argument("--edges", type=int, default=200_000)
    ap.add_argument("--n_rels", type=int, default=64)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--num_bases", type=int, default=16)
    ap.add_argument("--layer", default="allgather", choices=["allgather", "ring"])
    ap.add_argument("--phase", default="layer", choices=["layer", "rank"],
                    help="layer = halo R-GCN scaling; rank = sharded "
                         "full-ranking eval scaling (rank_shard)")
    ap.add_argument("--rank_entities", type=int, default=100_000)
    ap.add_argument("--rank_batch", type=int, default=256)
    args = ap.parse_args()

    n_avail = len(jax.devices())
    sizes = args.devices or sorted(
        {d for d in (1, 2, 4, 8) if d <= n_avail}
    )
    results = []
    for n_dev in sizes:
        if args.phase == "rank":
            r = bench_rank_mesh(
                n_dev, args.rank_entities, args.rank_batch, args.d)
        else:
            r = bench_mesh(
                n_dev, args.nodes, args.edges, args.n_rels, args.d,
                args.num_bases, layer=args.layer,
            )
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]
    if args.phase == "rank":
        summary = {
            "metric": "sharded_rank_scaling",
            "sizes": [r["devices"] for r in results],
            "ranked_queries_per_s": [
                r["ranked_queries_per_s"] for r in results],
            "backend": jax.default_backend(),
        }
    else:
        summary = {
            "metric": "halo_rgcn_scaling_efficiency",
            "sizes": [r["devices"] for r in results],
            "edges_per_s": [r["edges_per_s"] for r in results],
            "efficiency": [
                r["edges_per_s"]
                / (base["edges_per_s"] * r["devices"] / base["devices"])
                for r in results
            ],
            "backend": jax.default_backend(),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
