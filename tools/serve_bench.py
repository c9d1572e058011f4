#!/usr/bin/env python
"""Batched-stream serving throughput at production scale (VERDICT r2
weak #4): QueryServer on the real chip, flagship model shape (1M
entities, d=128, L3 basis-16), mixed-structure request stream at batch
256 — the production configuration BASELINE.md's round-2 note said
batched streams are (per-request relay dispatch latency ~30 ms makes
interactive single-query serving dispatch-bound; batching amortizes it).

Quality is irrelevant here (random params); the work per request — the
per-query-relation encode, the [B, n_entities] MXU ranking matmul, the
mode mask, on-device top-k, and the host-side packing loop — is the real
serving path (mpqe_tpu/serve.py).  ``answer()`` materializes the top-k
ids on host, so wall-clock timing is a true sync even over the relay.

  python tools/serve_bench.py [--batch 256] [--requests 40]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def random_queries(structures, n_per_structure, n_entities, n_modes,
                   n_rels, seed=0):
    from mpqe_tpu.queries import STRUCTURES, Formula, Query

    rng = np.random.default_rng(seed)
    pools = {}
    for s in structures:
        spec = STRUCTURES[s]
        qs = []
        for _ in range(n_per_structure):
            f = Formula(
                s, tuple(int(r) for r in rng.integers(0, n_rels,
                                                      spec.n_edges)),
                tuple(int(m) for m in rng.integers(0, n_modes,
                                                   spec.n_nodes)))
            qs.append(Query(
                f, tuple(int(a) for a in rng.integers(0, n_entities,
                                                      spec.n_anchors)),
                int(rng.integers(0, n_entities)), (), ()))
        pools[s] = qs
    return pools


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--modes", type=int, default=4)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--bases", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--requests", type=int, default=40)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--structures",
                    default="1-chain,2-chain,2-inter,3-chain_inter")
    args = ap.parse_args()

    import jax

    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.serve import QueryServer

    cfg = mpqe_mod.MPQEConfig(
        n_entities=args.entities, n_modes=args.modes, n_rels=args.rels,
        embed_dim=args.dim, n_layers=args.layers, num_bases=args.bases,
        readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    entity_mode = (np.arange(args.entities) //
                   max(args.entities // args.modes, 1)).astype(np.int32)
    entity_mode = np.minimum(entity_mode, args.modes - 1)
    server = QueryServer(params, cfg, entity_mode)
    structures = args.structures.split(",")
    print(json.dumps({"phase": "setup", "max_batch": server.max_batch,
                      "backend": jax.default_backend()}), flush=True)

    t0 = time.perf_counter()
    server.warmup(structures, batch=args.batch, k=args.k)
    print(json.dumps({"phase": "warmup",
                      "seconds": time.perf_counter() - t0}), flush=True)

    pools = random_queries(structures, 4 * args.batch, args.entities,
                           args.modes, args.rels)
    rng = np.random.default_rng(1)
    lat = []
    for _ in range(args.requests):
        s = structures[int(rng.integers(len(structures)))]
        pool = pools[s]
        req = [pool[int(i)]
               for i in rng.integers(0, len(pool), args.batch)]
        t0 = time.perf_counter()
        ans = server.answer(req, k=args.k)
        lat.append(time.perf_counter() - t0)
        assert len(ans) == args.batch and ans[0].entity_ids.shape == (args.k,)
    lat_ms = np.asarray(lat) * 1e3
    total_q = args.requests * args.batch
    print(json.dumps({
        "phase": "stream", "batch": args.batch, "k": args.k,
        "requests": args.requests,
        "latency_ms_p50": float(np.percentile(lat_ms, 50)),
        "latency_ms_p95": float(np.percentile(lat_ms, 95)),
        "queries_per_s": float(total_q / (lat_ms.sum() / 1e3)),
    }), flush=True)


if __name__ == "__main__":
    main()
