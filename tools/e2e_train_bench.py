#!/usr/bin/env python
"""Steady-state END-TO-END training throughput at the flagship shape.

Measures wall-clock queries/s INCLUDING host packing — the number the
device-step benchmarks silently exclude (VERDICT r2 item 5).  The path
under test is the production one: BatchPipeline packs K same-formula
batches per work item on its producer thread (C++ packer), pre-stacks
them with a leading [K] axis, device-puts them, and the train loop runs
one multistep ``lax.scan`` dispatch per item
(``loop.run_multistep_stacked``).

The store is a synthetic flagship-scale FormulaStore (1M entities, one
3-chain_inter formula, fallback-pool negatives) — packing cost is the
real per-batch host work; model quality is irrelevant here.

Reports per-phase breakdown (pack / stack+put / device) so a relay-
attached chip's transfer tax is visible rather than folded in silently.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_flagship_store(n_entities, n_modes, n_rels, n_queries, structure,
                        seed=0):
    """One-formula FormulaStore with random anchors/targets and on-the-fly
    fallback negatives — mode-consistent (entities live in contiguous
    per-mode id blocks)."""
    from mpqe_tpu.data.store import FormulaStore
    from mpqe_tpu.queries import STRUCTURES, Formula

    spec = STRUCTURES[structure]
    rng = np.random.default_rng(seed)
    per_mode = n_entities // n_modes
    node_modes = tuple(int(x) for x in rng.integers(0, n_modes, spec.n_nodes))
    rels = tuple(int(x) for x in rng.integers(0, n_rels, spec.n_edges))
    formula = Formula(structure=structure, rels=rels, node_modes=node_modes)

    def draw(mode, size):
        return (mode * per_mode
                + rng.integers(0, per_mode, size)).astype(np.int32)

    anchors = np.stack(
        [draw(node_modes[s], n_queries) for s in spec.anchor_slots], axis=1)
    t_mode = node_modes[spec.target_slot]
    targets = draw(t_mode, n_queries)
    return FormulaStore(
        formula=formula,
        anchors=anchors,
        targets=targets,
        neg_pool=np.zeros((0,), np.int32),
        neg_ptr=np.zeros((n_queries + 1,), np.int64),
        hard_pool=np.zeros((0,), np.int32),
        hard_ptr=np.zeros((n_queries + 1,), np.int64),
        fallback_pool=(t_mode * per_mode
                       + np.arange(per_mode, dtype=np.int32)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--modes", type=int, default=4)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--bases", type=int, default=16)
    ap.add_argument("--structure", default="3-chain_inter")
    ap.add_argument("--batch_size", type=int, default=131_072)
    ap.add_argument("--n_neg", type=int, default=4)
    ap.add_argument("--steps_per_call", type=int, default=8)
    ap.add_argument("--prefetch", type=int, default=2)
    ap.add_argument("--dispatches", type=int, default=12)
    ap.add_argument("--store_queries", type=int, default=262_144)
    ap.add_argument("--reuse_batch", action="store_true",
                    help="re-dispatch one already-on-device stacked batch "
                         "(isolates scheduler/dispatch overhead from the "
                         "per-dispatch host->device transfer — the upper "
                         "bound a direct-attached chip approaches)")
    args = ap.parse_args()

    import jax
    from mpqe_tpu.data.pipeline import BatchPipeline
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.train import loop as loop_mod

    cfg = mpqe_mod.MPQEConfig(
        n_entities=args.entities, n_modes=args.modes, n_rels=args.rels,
        embed_dim=args.dim, n_layers=args.layers, num_bases=args.bases,
        readout="tgt",
    )
    tc = loop_mod.TrainConfig(
        lr=0.01, batch_size=args.batch_size, n_neg=args.n_neg)
    state = loop_mod.init_train_state(jax.random.PRNGKey(0), cfg, tc)
    optimizer = loop_mod.make_optimizer(tc)
    multi_step = loop_mod.make_multistep_train_step(cfg, optimizer)

    t0 = time.perf_counter()
    fstore = make_flagship_store(
        args.entities, args.modes, args.rels, args.store_queries,
        args.structure)
    print(json.dumps({"phase": "store_build",
                      "seconds": time.perf_counter() - t0,
                      "n_queries": fstore.n_queries}), flush=True)

    # host-packing-only rate (no device work): what the producer thread
    # can sustain
    from mpqe_tpu.data import native as native_mod
    from mpqe_tpu.data.store import pack_dense_batch_np

    pack = (native_mod.pack_dense_batch_native
            if native_mod.available() else pack_dense_batch_np)
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    n_pack_probe = 4
    for _ in range(n_pack_probe):
        pick = rng.integers(0, fstore.n_queries,
                            args.batch_size).astype(np.int64)
        pack(fstore, pick, args.batch_size, args.n_neg, 7, False)
    pack_dt = (time.perf_counter() - t0) / n_pack_probe
    print(json.dumps({"phase": "pack_only", "seconds_per_batch": pack_dt,
                      "queries_per_s": args.batch_size / pack_dt,
                      "native": native_mod.available()}), flush=True)

    K = args.steps_per_call
    pipe = BatchPipeline(
        {args.structure: [fstore]}, batch_size=args.batch_size,
        n_neg=args.n_neg, structures=[args.structure], seed=0,
        prefetch=args.prefetch, steps_per_call=K,
    ).start()
    try:
        # warmup dispatch: compile + fill the pipeline
        b0 = next(pipe)
        t0 = time.perf_counter()
        loop_mod.run_multistep_stacked(multi_step, state, b0)
        print(json.dumps({
            "phase": "warmup_dispatch",
            "seconds": time.perf_counter() - t0}), flush=True)

        per_dispatch = []
        t_start = time.perf_counter()
        for _ in range(args.dispatches):
            t0 = time.perf_counter()
            batch = b0 if args.reuse_batch else next(pipe)
            t_fetch = time.perf_counter() - t0
            losses = loop_mod.run_multistep_stacked(
                multi_step, state, batch)
            t_total = time.perf_counter() - t0
            per_dispatch.append((t_fetch, t_total))
            assert np.isfinite(losses[-1])
        wall = time.perf_counter() - t_start
    finally:
        pipe.stop()

    n_steps = args.dispatches * K
    fetches = [f for f, _ in per_dispatch]
    print(json.dumps({
        "phase": "steady_state",
        "reuse_batch": bool(args.reuse_batch),
        "backend": jax.default_backend(),
        "dispatches": args.dispatches,
        "steps_per_call": K,
        "batch": args.batch_size,
        "wall_seconds": wall,
        "seconds_per_step": wall / n_steps,
        "end_to_end_queries_per_s": n_steps * args.batch_size / wall,
        "mean_fetch_wait_s": float(np.mean(fetches)),
        "max_fetch_wait_s": float(np.max(fetches)),
        "per_dispatch_s": [round(t, 4) for _, t in per_dispatch],
    }), flush=True)


if __name__ == "__main__":
    main()
