#!/usr/bin/env python
"""BASELINE config[4] scale demo: synthetic 100M-edge KG, batched
3-chain_inter queries, training-step throughput.

Exercises the native host runtime at production scale: C++ KG generation,
incoming-CSR build, batched backward-walk query sampling — then times the
dense-path train step on whatever accelerator is present.  On a pod slice
the same script runs with the SPMD step over the full mesh.

Usage (defaults are laptop-safe; full scale needs ~6 GB host RAM):
  python tools/big_kg_demo.py --triples 100000000 --queries 1000000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=10_000_000)
    ap.add_argument("--modes", type=int, default=8)
    ap.add_argument("--base_rels", type=int, default=64)
    ap.add_argument("--triples", type=int, default=100_000_000)
    ap.add_argument("--queries", type=int, default=1_000_000)
    ap.add_argument("--structure", default="3-chain_inter")
    ap.add_argument("--batch_size", type=int, default=65_536)
    ap.add_argument("--n_neg", type=int, default=4)
    ap.add_argument("--train_steps", type=int, default=0,
                    help="0 = skip the device training phase")
    args = ap.parse_args()

    from mpqe_tpu.data import native
    if not native.ensure_built():
        raise SystemExit("C++ host library unavailable")

    t0 = time.perf_counter()
    kg = native.make_synthetic_kg_native(
        args.entities, args.modes, args.base_rels, args.triples, seed=0)
    t_gen = time.perf_counter() - t0
    print(json.dumps({"phase": "kg_gen", "triples": kg.n_triples,
                      "seconds": t_gen,
                      "triples_per_s": kg.n_triples / t_gen}), flush=True)

    t0 = time.perf_counter()
    out = native.sample_queries_native(
        kg, args.structure, args.queries, n_neg=args.n_neg, seed=1)
    t_s = time.perf_counter() - t0
    ok = out["entities"][:, 0] >= 0
    print(json.dumps({"phase": "query_sampling", "requested": args.queries,
                      "sampled_ok": int(ok.sum()), "seconds": t_s,
                      "queries_per_s": args.queries / t_s}), flush=True)

    # raw-edge 1-chain stores: array-native, zero per-edge Python objects,
    # on-the-fly fallback negatives (no materialized pools).  At 100M
    # edges this holds ~800 MB of triple views + O(n_mode) pools — the
    # old per-query materialization would need ~26 GB.
    t0 = time.perf_counter()
    from mpqe_tpu.data.store import stores_from_edges

    stores = stores_from_edges(kg)["1-chain"]
    t_st = time.perf_counter() - t0
    n_edge_q = sum(s.n_queries for s in stores)
    t0 = time.perf_counter()
    big = max(stores, key=lambda s: s.n_queries)
    pick = np.random.default_rng(0).integers(
        0, big.n_queries, args.batch_size).astype(np.int64)
    b = native.pack_dense_batch_native(
        big, pick, args.batch_size, args.n_neg, seed=3)
    t_pk = time.perf_counter() - t0
    assert float(b.neg_mask.min()) == 1.0  # fallback negatives present
    print(json.dumps({"phase": "raw_edge_stores", "edge_queries": n_edge_q,
                      "build_seconds": t_st,
                      "pack_batch_seconds": t_pk,
                      "pack_queries_per_s": args.batch_size / t_pk}),
          flush=True)

    if args.train_steps <= 0:
        return

    import jax
    import jax.numpy as jnp
    import optax
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.queries import STRUCTURES
    from mpqe_tpu.utils import profiling

    spec = STRUCTURES[args.structure]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=args.entities, n_modes=args.modes,
        n_rels=2 * args.base_rels, embed_dim=128, n_layers=3,
        num_bases=16, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    B = args.batch_size
    ents = out["entities"][ok][:B]
    rels = out["rels"][ok][:B]
    negs = out["negatives"][ok][:B]
    node_entity = jnp.asarray(ents)
    node_mode = jnp.asarray(kg.entity_mode[ents])
    edge_rel = jnp.asarray(rels[0])  # same-formula batch approximation
    edge_norm = jnp.asarray(np.ones((spec.n_edges,), np.float32))
    target = jnp.asarray(ents[:, spec.target_slot])
    negatives = jnp.asarray(negs)
    masks = jnp.asarray(np.ones((B, args.n_neg), np.float32))
    qmask = jnp.asarray(np.ones((B,), np.float32))

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step_loop(p, o, n):
        def body(i, carry):
            pp, oo, _ = carry
            def loss_fn(q):
                return mpqe_mod.dense_batch_loss(
                    q, cfg, args.structure, node_entity, node_mode,
                    edge_rel, edge_norm, target, negatives, masks, qmask)
            l, g = jax.value_and_grad(loss_fn)(pp)
            up, oo = opt.update(g, oo, pp)
            return optax.apply_updates(pp, up), oo, l
        _, _, l = jax.lax.fori_loop(0, n, body, (p, o, jnp.float32(0)))
        return l

    dt = profiling.loop_time(lambda n: step_loop(params, opt_state, n),
                             n_small=2, n_large=2 + args.train_steps)
    print(json.dumps({"phase": "train", "backend": jax.default_backend(),
                      "step_seconds": dt, "queries_per_s": B / dt}),
          flush=True)


if __name__ == "__main__":
    main()
