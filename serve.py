#!/usr/bin/env python
"""Serve a trained checkpoint: answer queries with top-k entities.

Loads a run directory (like evaluate.py), builds a QueryServer, answers
a stream of sampled queries, and reports latency percentiles and
throughput — the serving-path counterpart of bench.py.

Usage:
  python serve.py --run_dir runs/xyz [--k 10] [--requests 200]
                  [--batch 1] [--structures 1-chain,2-chain]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from mpqe_tpu.data.sampler import QuerySampler
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.serve import QueryServer
from mpqe_tpu.train import checkpoint as ckpt_mod
from mpqe_tpu.train import loop as loop_mod
from train import load_data, parse_args as train_parse_args


def main(argv=None):
    from mpqe_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()  # see mpqe_tpu/utils/platform.py
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--requests", type=int, default=100)
    p.add_argument("--batch", type=int, default=1,
                   help="queries per request")
    p.add_argument("--structures", default="1-chain,2-chain,2-inter")
    p.add_argument("--http", default=None, metavar="HOST:PORT",
                   help="serve an HTTP JSON API (POST /v1/answer, GET "
                        "/healthz) with cross-request micro-batching "
                        "instead of running the sampled-stream benchmark")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="HTTP mode: how long a request waits to coalesce "
                        "with concurrent traffic into one dispatch")
    p.add_argument("--table_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="candidate-table dtype for the rank matmul: "
                        "bfloat16 halves / int8 quarters the table bytes "
                        "and raises the MXU rate (recall-vs-f32 pinned in "
                        "tests; int8 needs cosine scoring)")
    p.add_argument("--answer", default=None, metavar="QUERIES_PKL",
                   help="bulk offline mode: answer every query in a GQE-"
                        "format queries pickle and write top-k ids/scores "
                        "to --out (.npz); skips the latency benchmark")
    p.add_argument("--out", default=None,
                   help=".npz output for --answer (entity_ids [N,k], "
                        "scores [N,k], structure [N], target [N])")
    p.add_argument("--shards", type=int, default=0,
                   help=">1: serve over a model-axis mesh of this many "
                        "devices with the entity table row-sharded "
                        "(ShardedQueryServer — tables that exceed one "
                        "chip; MPQE checkpoints only)")
    args, _ = p.parse_known_args(argv)

    http_host = http_port = None
    if args.http:
        # fail fast: checkpoint load + warmup can take minutes, so a
        # malformed flag must not surface only afterwards
        http_host, _, port_s = args.http.rpartition(":")
        try:
            http_port = int(port_s)
        except ValueError:
            raise SystemExit(
                f"--http expects HOST:PORT, got {args.http!r}") from None

    with open(os.path.join(args.run_dir, "config.json")) as f:
        run_cfg = json.load(f)
    with open(os.path.join(args.run_dir, "model_config.json")) as f:
        mc = json.load(f)
    init_fn = None
    if "readout" in mc:  # MPQE
        cfg = mpqe_mod.MPQEConfig(
            n_entities=mc["n_entities"], n_modes=mc["n_modes"],
            n_rels=mc["n_rels"], embed_dim=mc["embed_dim"],
            n_layers=mc["n_layers"], num_bases=mc["num_bases"],
            readout=mc["readout"], margin=mc["margin"],
        )
    else:  # GQE baseline
        from mpqe_tpu.models import gqe as gqe_mod

        cfg = gqe_mod.GQEConfig(
            n_entities=mc["n_entities"], n_modes=mc["n_modes"],
            n_rels=mc["n_rels"], embed_dim=mc["embed_dim"],
            decoder=mc["decoder"], intersection=mc["intersection"],
            soft_and=mc["soft_and"], margin=mc["margin"],
            encoder=mc.get("encoder", "direct"),
            aggregator=mc.get("aggregator", "mean"),
        )
        init_fn = gqe_mod.init_gqe
    targs = train_parse_args(
        [f"--{k}" if v is True else f"--{k}={v}"
         for k, v in run_cfg.items()
         if k in ("data", "structures", "custom_structures", "seed", "syn_entities", "syn_modes",
                  "syn_rels", "syn_triples") and v is not None])
    kg, _, _ = load_data(targs)

    template = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg,
        loop_mod.train_config_from_run(run_cfg), init_fn=init_fn)
    ckpt = args.ckpt or ckpt_mod.latest_checkpoint(
        os.path.join(args.run_dir, "ckpt"))
    if ckpt is None:
        raise SystemExit("no checkpoint found")
    state = ckpt_mod.restore_checkpoint(ckpt, template)

    neighbor_table = None
    if getattr(cfg, "encoder", None) == "neighborhood":
        from mpqe_tpu.models import aggregators as agg_mod

        neighbor_table = agg_mod.build_neighbor_table_device(
            kg, fanout=run_cfg["gqe_fanout"], seed=run_cfg["seed"])
    if args.shards > 1:
        from mpqe_tpu.parallel import mesh as mesh_lib
        from mpqe_tpu.serve import ShardedQueryServer

        if len(jax.devices()) < args.shards:
            raise SystemExit(
                f"--shards {args.shards} needs that many devices, have "
                f"{len(jax.devices())} (CPU: set XLA_FLAGS="
                "--xla_force_host_platform_device_count)")
        if neighbor_table is not None:
            raise SystemExit(
                "--shards does not support neighborhood-GQE checkpoints")
        mesh = mesh_lib.make_mesh(
            (1, args.shards), devices=jax.devices()[:args.shards])
        server = ShardedQueryServer(state.params, cfg, kg.entity_mode,
                                    mesh, table_dtype=args.table_dtype)
    else:
        server = QueryServer(state.params, cfg, kg.entity_mode,
                             neighbor_table=neighbor_table,
                             table_dtype=args.table_dtype)
    if args.answer:
        if not args.out:
            raise SystemExit("--answer requires --out <file.npz>")
        from mpqe_tpu.data import loader as loader_mod

        grouped = loader_mod.load_queries_pickle(args.answer, kg)
        flat = [q for by_f in grouped.values()
                for qs in by_f.values() for q in qs]
        if not flat:
            raise SystemExit(f"--answer: no queries in {args.answer}")
        # warm every power-of-two bucket the bulk request will hit (one
        # compile each is minutes on the relay TPU); cap at the server's
        # max_batch — answer() chunks there, so larger warmups would just
        # re-dispatch the compiled max-size program on dummy data
        server.warmup(sorted(grouped),
                      batch=min(max(args.batch, len(flat)),
                                server.max_batch), k=args.k)
        t0 = time.perf_counter()
        answers = server.answer(flat, k=args.k)
        dt = time.perf_counter() - t0
        np.savez(
            args.out,
            entity_ids=np.stack([a.entity_ids for a in answers]),
            scores=np.stack([a.scores for a in answers]),
            structure=np.asarray(
                [q.formula.structure for q in flat]),
            target=np.asarray([q.target for q in flat], np.int32),
        )
        hits = sum(int(q.target in a.entity_ids.tolist())
                   for q, a in zip(flat, answers))
        print(json.dumps({
            "checkpoint": ckpt, "queries": len(flat), "k": args.k,
            "out": args.out, "seconds": dt,
            "queries_per_s": len(flat) / dt,
            "hit_at_k": hits / len(flat),
        }))
        return

    structures = args.structures.split(",")
    server.warmup(structures, batch=args.batch, k=args.k)

    if args.http:
        from mpqe_tpu.netserve import make_http_server

        httpd = make_http_server(
            server, kg, http_host or "127.0.0.1", http_port,
            default_k=args.k, max_wait_ms=args.max_wait_ms)
        print(json.dumps({
            "listening": f"{httpd.server_address[0]}:{httpd.server_address[1]}",
            "endpoints": ["GET /healthz", "POST /v1/answer"],
            "warmed_structures": structures,
            "max_wait_ms": args.max_wait_ms,
        }), flush=True)
        try:
            httpd.serve_forever()
        finally:
            httpd.batcher.stop()
        return

    sampler = QuerySampler(kg, seed=123)
    pools = {s: sampler.sample_queries(
        s, max(args.requests // len(structures) + args.batch, args.batch),
        n_neg=1) for s in structures}
    rng = np.random.default_rng(0)
    lat = []
    hits = total = 0
    for _ in range(args.requests):
        s = structures[rng.integers(len(structures))]
        pool = pools[s]
        req = [pool[int(i)] for i in rng.integers(0, len(pool), args.batch)]
        t0 = time.perf_counter()
        answers = server.answer(req, k=args.k)
        lat.append(time.perf_counter() - t0)
        for q, a in zip(req, answers):
            total += 1
            hits += int(q.target in a.entity_ids.tolist())
    lat_ms = np.asarray(lat) * 1e3
    print(json.dumps({
        "checkpoint": ckpt,
        "requests": args.requests,
        "batch": args.batch,
        "k": args.k,
        "latency_ms_p50": float(np.percentile(lat_ms, 50)),
        "latency_ms_p95": float(np.percentile(lat_ms, 95)),
        "queries_per_s": float(total / lat_ms.sum() * 1e3),
        "hit_at_k": hits / max(total, 1),
    }))


if __name__ == "__main__":
    main()
