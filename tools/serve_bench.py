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
    ap.add_argument("--http_clients", type=int, default=0,
                    help=">0: also run an HTTP phase — this many client "
                         "threads fire --requests requests of "
                         "--http_batch queries each at a local netserve "
                         "instance (measures the network + dynamic-"
                         "batching path over the same QueryServer)")
    ap.add_argument("--http_batch", type=int, default=32)
    ap.add_argument("--http_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    from mpqe_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()  # honor JAX_PLATFORMS=cpu for offline runs

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

    if args.http_clients > 0:
        http_phase(args, server, entity_mode)


def http_phase(args, server, entity_mode):
    """Concurrent clients -> netserve HTTP -> micro-batched dispatches.

    Schema validation is strict on the wire, so the shim KG makes every
    relation mode-0 -> mode-0 and anchors come from mode-0 entities —
    mode choice only gates the candidate mask, the ranking work is
    unchanged."""
    import threading
    import urllib.request

    from mpqe_tpu.graph import KnowledgeGraph
    from mpqe_tpu.netserve import make_http_server

    n_base = args.rels // 2
    kg_shim = KnowledgeGraph(
        n_entities=args.entities, n_base_rels=n_base,
        entity_mode=entity_mode,
        rel_domain=np.zeros(n_base, np.int32),
        rel_range=np.zeros(n_base, np.int32),
        heads=np.zeros(0, np.int32), rels=np.zeros(0, np.int32),
        tails=np.zeros(0, np.int32),
    )
    httpd = make_http_server(server, kg_shim, "127.0.0.1", 0,
                             default_k=args.k,
                             max_wait_ms=args.http_wait_ms)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/answer"

    rng = np.random.default_rng(2)
    structures = args.structures.split(",")
    from mpqe_tpu.queries import STRUCTURES
    n_mode0 = int(np.sum(entity_mode == 0))

    def make_payload():
        s = structures[int(rng.integers(len(structures)))]
        spec = STRUCTURES[s]
        # entity_mode is block-contiguous: mode-0 ids are [0, n_mode0);
        # every directed rel id is 0->0 under the shim schema
        qs = [{"structure": s,
               "anchors": [int(a) for a in
                           rng.integers(0, n_mode0, spec.n_anchors)],
               "rels": [int(r) for r in
                        rng.integers(0, 2 * n_base, spec.n_edges)]}
              for _ in range(args.http_batch)]
        return json.dumps({"queries": qs, "k": args.k}).encode()

    lat = []
    errors = []
    lat_lock = threading.Lock()

    def client():
        for _ in range(args.requests):
            body = make_payload()
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            # a failed request must surface in the JSON line, not kill
            # this thread silently and overstate the throughput numbers
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    out = json.loads(r.read())
                if len(out["answers"]) != args.http_batch:
                    raise RuntimeError(
                        f"short response: {len(out['answers'])} answers")
            except Exception as e:  # noqa: BLE001 — report in stats
                with lat_lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(args.http_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    httpd.shutdown()
    httpd.batcher.stop()
    if not lat:
        print(json.dumps({"phase": "http_stream", "error":
                          f"all {len(errors)} requests failed",
                          "first_error": errors[0] if errors else None}),
              flush=True)
        return
    lat_ms = np.asarray(lat) * 1e3
    total_q = len(lat) * args.http_batch  # successful queries only
    sizes = list(httpd.batcher.batch_sizes)
    print(json.dumps({
        "phase": "http_stream", "clients": args.http_clients,
        "http_batch": args.http_batch, "k": args.k,
        "wall_s": wall,
        "requests_per_s": float(len(lat) / wall),
        "queries_per_s": float(total_q / wall),
        "latency_ms_p50": float(np.percentile(lat_ms, 50)),
        "latency_ms_p95": float(np.percentile(lat_ms, 95)),
        "dispatches": httpd.batcher.total_dispatches,
        "mean_dispatch_queries": float(np.mean(sizes)) if sizes else 0.0,
        "errors": len(errors),
        **({"first_error": errors[0]} if errors else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
