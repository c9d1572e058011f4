#!/usr/bin/env python
"""Evaluate a trained checkpoint: AUC/APR per structure, optionally split
into seen-edges vs one-new-edge generalization buckets (reference's test
protocol; SURVEY.md §A.3).

Usage:
  python evaluate.py --run_dir runs/xyz [--data synthetic ...] [--split]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from mpqe_tpu.data import loader as loader_mod
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import group_queries_by_formula
from mpqe_tpu.train import checkpoint as ckpt_mod
from mpqe_tpu.train import evaluation
from mpqe_tpu.train import loop as loop_mod
from train import load_data, parse_args as train_parse_args


def main(argv=None):
    from mpqe_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()  # see mpqe_tpu/utils/platform.py
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ckpt", default=None, help="defaults to latest in run_dir/ckpt")
    p.add_argument("--split", action="store_true",
                   help="report seen-edges vs one-new-edge buckets")
    p.add_argument("--use", default="val", choices=["val", "test"],
                   help="which held-out set to score: val (default) or "
                        "the TEST split — test_{edges,queries_*}.pkl for "
                        "pkl data (the reference reports test numbers), "
                        "a fresh disjoint-seed draw for synthetic/npz")
    p.add_argument("--n_neg", type=int, default=64)
    p.add_argument("--ranking", action="store_true",
                   help="also report full-candidate MRR / Hits@K per "
                        "structure (every same-mode entity ranked via one "
                        "[B, n_entities] matmul per chunk — beyond the "
                        "reference's sampled-negative protocol)")
    p.add_argument("--hits_at", default="1,3,10")
    p.add_argument("--shards", type=int, default=0,
                   help=">1: run --ranking over a model-axis mesh of this "
                        "many devices with the entity table row-sharded "
                        "(full_ranking_sharded — tables that exceed one "
                        "chip; MPQE checkpoints only)")
    args, _ = p.parse_known_args(argv)

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

    # rebuild the data exactly as the run saw it
    targs = train_parse_args(
        [f"--{k}" if v is True else f"--{k}={v}"
         for k, v in run_cfg.items()
         if k in ("data", "structures", "custom_structures", "seed", "syn_entities", "syn_modes",
                  "syn_rels", "syn_triples", "syn_train_queries",
                  "syn_val_queries") and v is not None]
    )
    kg, _, val_q = load_data(targs)

    if args.use == "test":
        data = run_cfg.get("data", "")
        if data.startswith("pkl:"):
            d = data[4:]
            test_q = loader_mod.load_split_queries(d, kg, "test")
            if not test_q:
                raise SystemExit(f"--use test: no test_*.pkl under {d}")
            val_q = test_q
        else:
            # synthetic/npz have no test files: fresh held-out draw from
            # a disjoint RNG stream (same counts as the val draw)
            from mpqe_tpu.data.sampler import QuerySampler

            sampler = QuerySampler(kg, seed=targs.seed + 7919)
            per_s = max(1, targs.syn_val_queries
                        // max(len(val_q), 1))
            fresh = []
            for s in val_q:
                fresh += sampler.sample_queries(s, per_s, n_neg=64)
            val_q = group_queries_by_formula(fresh)

    # the neighborhood encoder's fanout table is a deterministic function
    # of (kg, fanout, seed) — rebuild it exactly as the run sampled it
    neighbor_table = None
    if getattr(cfg, "encoder", None) == "neighborhood":
        from mpqe_tpu.models import aggregators as agg_mod

        neighbor_table = agg_mod.build_neighbor_table_device(
            kg, fanout=run_cfg["gqe_fanout"], seed=run_cfg["seed"])

    # optimizer knobs (clip/adamw/schedule) change the opt_state pytree —
    # the restore template must match what the run trained with
    tc = loop_mod.train_config_from_run(run_cfg)
    template = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg, tc, init_fn=init_fn)
    ckpt = args.ckpt or ckpt_mod.latest_checkpoint(
        os.path.join(args.run_dir, "ckpt"))
    if ckpt is None:
        raise SystemExit("no checkpoint found")
    state = ckpt_mod.restore_checkpoint(ckpt, template)

    # batched single-sweep eval (both MPQE and GQE encode per-query
    # relations)
    def run_eval(queries):
        return evaluation.evaluate_batched(
            state.params, cfg, evaluation.make_eval_set(queries),
            n_neg=args.n_neg, neighbor_table=neighbor_table)

    res = run_eval(val_q)
    print(json.dumps({"checkpoint": ckpt, "step": state.step,
                      "use": args.use, **res.flat()}))

    if args.ranking:
        hits = tuple(int(k) for k in args.hits_at.split(","))
        if args.shards > 1:
            from mpqe_tpu.parallel import mesh as mesh_lib

            if len(jax.devices()) < args.shards:
                raise SystemExit(
                    f"--shards {args.shards} needs that many devices, "
                    f"have {len(jax.devices())}")
            mesh = mesh_lib.make_mesh(
                (1, args.shards), devices=jax.devices()[:args.shards])
            rk = evaluation.full_ranking_sharded(
                state.params, cfg, val_q, kg.entity_mode, mesh,
                hits_at=hits)
        else:
            rk = evaluation.full_ranking(
                state.params, cfg, val_q, kg.entity_mode, hits_at=hits,
                neighbor_table=neighbor_table)
        for structure, m in rk.items():
            print(json.dumps({"ranking": structure, **m}))

    if args.split:
        flat = [q for by_f in val_q.values() for qs in by_f.values() for q in qs]
        seen, new = loader_mod.split_one_new_edge(flat, kg)
        for name, bucket in (("seen_edges", seen), ("one_new_edge", new)):
            if not bucket:
                continue
            r = run_eval(group_queries_by_formula(bucket))
            print(json.dumps({"bucket": name, "n": len(bucket), **r.flat()}))


if __name__ == "__main__":
    main()
