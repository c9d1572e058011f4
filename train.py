#!/usr/bin/env python
"""Experiment driver: config + CLI -> data -> model -> curriculum training.

Replaces the reference's Sacred-based ``train.py`` (SURVEY.md §2.1 L6) with
a dataclass config + argparse CLI; every run writes its full config and a
JSONL metrics stream into ``--run_dir`` and checkpoints best-validation
state via Orbax.

Data sources:
  --data synthetic         a generated KG + sampled queries (offline-friendly)
  --data npz:<kg.npz>      native KG array format (queries sampled on the fly)
  --data pkl:<dir>         GQE pickle directory (graph_data.pkl + query pickles)

Examples:
  python train.py --data synthetic --readout tgt --n_layers 3 --steps 2000
  python train.py --data pkl:/data/AIFB --readout sum --num_bases 16
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp

from mpqe_tpu.data import loader as loader_mod
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import STRUCTURE_NAMES, group_queries_by_formula
from mpqe_tpu.train import checkpoint as ckpt_mod
from mpqe_tpu.train import evaluation
from mpqe_tpu.train import loop as loop_mod
from mpqe_tpu.train.metrics import MetricsWriter


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--run_dir", default=None)
    p.add_argument("--model", default="rgcn",
                   choices=["rgcn", "gqe", "gqe_softand"],
                   help="rgcn = MPQE; gqe / gqe_softand = GQE baselines")
    p.add_argument("--decoder", default="bilinear",
                   choices=["bilinear", "transe", "distmult", "box",
                            "bibox"],
                   help="GQE metapath decoder; 'box' = Query2Box "
                        "geometry (round-5 extension beyond the "
                        "reference — box intersection targets the "
                        "measured hard-negative generalization limit)")
    p.add_argument("--intersection", default="deepsets",
                   choices=["min", "mean", "deepsets"])
    p.add_argument("--gqe_encoder", default="direct",
                   choices=["direct", "neighborhood"],
                   help="GQE anchor encoder: direct embedding lookup, or "
                        "the GraphSAGE-style neighborhood aggregator over "
                        "a fixed-fanout table sampled once from the KG "
                        "(models/aggregators.py)")
    p.add_argument("--gqe_aggregator", default="mean",
                   choices=["mean", "max", "pool"])
    p.add_argument("--bibox_w", type=float, default=1.0,
                   help="decoder='bibox': weight of the box-affinity "
                        "term in the fused cosine+box score")
    p.add_argument("--gqe_fanout", type=int, default=8)
    p.add_argument("--embed_dim", type=int, default=128)
    p.add_argument("--n_layers", type=int, default=3)
    p.add_argument("--num_bases", type=int, default=0,
                   help="0 = full per-relation weights")
    p.add_argument("--readout", default="tgt",
                   choices=["tgt", "sum", "max", "concat", "mlp"])
    p.add_argument("--margin", type=float, default=1.0)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="params/activations/optimizer-state dtype; "
                        "bfloat16 measured 12% faster per flagship step "
                        "(36.9 vs 42.0 ms, BASELINE.md) at reduced "
                        "precision")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--lr_schedule", default="const",
                   choices=["const", "cosine", "warmup_cosine"])
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear warmup length for --lr_schedule "
                        "warmup_cosine")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off)")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help=">0 uses adamw (decoupled decay on every param "
                        "incl. the entity table)")
    p.add_argument("--hard_margin", type=float, default=0.0,
                   help="margin for hard-negative (strict-subset) "
                        "batches; 0 = the model margin (reference "
                        "convention).  Measured round 5: the full "
                        "cosine margin never saturates against subset "
                        "satisfiers and distorts the encoder — 0.2 "
                        "preserves plain APR (BASELINE.md)")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--n_neg", type=int, default=1)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--val_every", type=int, default=1000)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help=">1: scan K train steps per device dispatch")
    p.add_argument("--kernel", default="dense",
                   choices=["dense", "fused", "blocked", "fused_fwd"],
                   help="R-GCN compute path: dense = structure-batched "
                        "template einsums (default); fused = relation-"
                        "chunked Pallas kernel; blocked = bf16 blocked "
                        "Pallas kernel (needs --num_bases); fused_fwd = "
                        "dense math with the forward run as ONE Pallas "
                        "kernel per block (ops/pallas_fused_fwd, needs "
                        "--readout tgt). Sparse layouts are synthesized "
                        "on-device per step (ops/template_layout.py)")
    p.add_argument("--shared_negatives", type=int, default=0,
                   metavar="K",
                   help="train with K batch-shared negative candidates "
                        "instead of per-query negatives (protocol "
                        "variant, ~1.6x faster step at the flagship "
                        "shape; rgcn, --kernel dense or fused_fwd). "
                        "0 = off")
    p.add_argument("--self_adv_tau", type=float, default=0.0,
                   metavar="TAU",
                   help="with --shared_negatives: weight each query's "
                        "candidate violations by softmax(TAU * score) "
                        "with stop_gradient (RotatE self-adversarial "
                        "sampling) instead of the uniform mean — "
                        "concentrates the margin push on hard "
                        "negatives at no extra table traffic. 0 = "
                        "uniform (default)")
    p.add_argument("--fused_backward", default="xla",
                   choices=["xla", "pallas"],
                   help="gradient path for --kernel fused_fwd: xla = "
                        "recompute through the XLA forward (grads bit-"
                        "identical to --kernel dense); pallas = fused "
                        "Pallas backward kernel (VMEM-resident reverse "
                        "sweep, tolerance-parity grads)")
    p.add_argument("--fused_block", type=int, default=2048,
                   help="fused_fwd forward block rows (4096 measured "
                        "fastest at the flagship shape, BASELINE.md)")
    p.add_argument("--fused_bwd_block", type=int, default=1024,
                   help="fused_fwd Pallas-backward block rows")
    p.add_argument("--parallel", default="none",
                   choices=["none", "spmd", "halo_ring", "halo_gather"],
                   help="distributed train step: spmd = GSPMD DP+TP+EP; "
                        "halo_* = explicit edge-partitioned shard_map "
                        "layers (ppermute ring / all_gather halo)")
    p.add_argument("--mesh", default="",
                   help="mesh shape 'data,model' (default: all devices "
                        "on the data axis)")
    p.add_argument("--prefetch", type=int, default=0,
                   help=">0: background batch pipeline depth")
    p.add_argument("--warmup", action="store_true",
                   help="AOT-compile all (structure, bucket) programs before training")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --run_dir")
    p.add_argument("--trace", type=int, default=0,
                   help=">0: capture a jax.profiler trace of this many "
                        "train steps into RUN_DIR/trace (TensorBoard)")
    p.add_argument("--trace_skip", type=int, default=20,
                   help="steps to run before the trace starts (lets "
                        "compiles and warmup fall outside the window)")
    p.add_argument("--keep_best", type=int, default=3,
                   help="retain only the best-k validation checkpoints")
    p.add_argument("--structures", default="all",
                   help="comma list or 'all' or 'chains'")
    p.add_argument("--custom_structures", default=None,
                   help="JSON file registering extra query-DAG templates "
                        "before data loading: a list of {name, n_anchors, "
                        "n_vars, edges} objects (queries.register_structure)"
                        " — name them in --structures to train on them")
    # synthetic data knobs
    p.add_argument("--syn_entities", type=int, default=500)
    p.add_argument("--syn_modes", type=int, default=3)
    p.add_argument("--syn_rels", type=int, default=6)
    p.add_argument("--syn_triples", type=int, default=5000)
    p.add_argument("--syn_train_queries", type=int, default=2000)
    p.add_argument("--syn_val_queries", type=int, default=200)
    return p.parse_args(argv)


def load_data(args):
    if getattr(args, "custom_structures", None):
        import json as _json

        from mpqe_tpu.queries import STRUCTURES, register_structure

        with open(args.custom_structures) as f:
            for spec in _json.load(f):
                edges = [(int(s), int(d)) for s, d in spec["edges"]]
                if spec["name"] in STRUCTURES:
                    # idempotent across resume/eval reloads — but ONLY
                    # for the identical template; silently training on a
                    # different same-named DAG would be wrong answers
                    ex = STRUCTURES[spec["name"]]
                    same = (
                        len(ex.anchor_slots) == int(spec["n_anchors"])
                        and len(ex.var_slots) == int(spec["n_vars"])
                        and list(zip(ex.edge_src, ex.edge_dst)) == edges)
                    if not same:
                        raise ValueError(
                            f"--custom_structures: {spec['name']!r} is "
                            "already registered with a DIFFERENT template "
                            "(rename the custom structure)")
                    continue
                register_structure(
                    spec["name"], spec["n_anchors"], spec["n_vars"], edges)
    structures = (
        list(STRUCTURE_NAMES)
        if args.structures == "all"
        else (["1-chain", "2-chain", "3-chain"] if args.structures == "chains"
              else args.structures.split(","))
    )
    if args.data == "synthetic" or args.data.startswith("npz:"):
        if args.data == "synthetic":
            kg = make_random_kg(
                n_entities=args.syn_entities, n_modes=args.syn_modes,
                n_base_rels=args.syn_rels, n_triples=args.syn_triples,
                seed=args.seed,
            )
        else:
            kg = loader_mod.load_kg_npz(args.data[4:])
        sampler = QuerySampler(kg, seed=args.seed)
        per_s_train = max(1, args.syn_train_queries // len(structures))
        per_s_val = max(1, args.syn_val_queries // len(structures))
        train_q, val_q = [], []
        for s in structures:
            train_q += sampler.sample_queries(s, per_s_train, n_neg=32)
            val_q += sampler.sample_queries(s, per_s_val, n_neg=64)
        return kg, group_queries_by_formula(train_q), group_queries_by_formula(val_q)
    if args.data.startswith("pkl:"):
        d = args.data[4:]
        kg, _, _ = loader_mod.load_graph_pickle(os.path.join(d, "graph_data.pkl"))
        # 1-chain data comes from {train,val}_edges.pkl in the GQE lineage
        # (SURVEY.md §A.3); when train_edges.pkl is absent, main() derives
        # the 1-chain training set from the train graph's edges directly
        # (stores_from_edges — the two are equivalent by construction).
        train_q = loader_mod.load_split_queries(d, kg, "train")
        val_q = loader_mod.load_split_queries(d, kg, "val")
        return kg, train_q, val_q
    raise ValueError(f"unknown --data {args.data}")


def main(argv=None):
    # honor JAX_PLATFORMS=cpu in-process: sitecustomize's axon patch
    # otherwise initializes the TPU backend anyway (and blocks if the
    # relay is down) — see mpqe_tpu/utils/platform.py
    from mpqe_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    args = parse_args(argv)
    run_dir = args.run_dir or os.path.join(
        "runs", time.strftime("%Y%m%d-%H%M%S")
    )
    metrics = MetricsWriter(run_dir)
    metrics.write_config(vars(args))

    kg, train_q, val_q = load_data(args)
    neighbor_table = None
    if args.model == "rgcn":
        cfg = mpqe_mod.MPQEConfig(
            n_entities=kg.n_entities,
            n_modes=kg.n_modes,
            n_rels=kg.n_rels,
            embed_dim=args.embed_dim,
            n_layers=args.n_layers,
            num_bases=args.num_bases or None,
            readout=args.readout,
            margin=args.margin,
            dtype=jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32,
        )
        init_fn, batch_loss_fn = None, None
        on_cpu = jax.default_backend() == "cpu"
        if args.kernel != "dense":
            import functools

            if args.kernel == "blocked" and not args.num_bases:
                raise SystemExit("--kernel blocked requires --num_bases")
            if args.kernel == "fused_fwd" and args.readout != "tgt":
                raise SystemExit("--kernel fused_fwd requires --readout tgt")
            # (the round-3 f32-only guard is gone: the kernel already
            # runs bf16 inter-layer activations, which IS the bf16
            # pipeline's numerics — parity pinned in
            # tests/test_pallas_fused_fwd.py)
            kernel_losses = {
                "fused": mpqe_mod.dense_batch_loss_kernel_fused,
                "blocked": mpqe_mod.dense_batch_loss_kernel_blocked,
            }
            if args.kernel == "fused_fwd":
                batch_loss_fn = functools.partial(
                    mpqe_mod.dense_batch_loss_kernel_fused_fwd,
                    block=args.fused_block,
                    backward=args.fused_backward,
                    bwd_block=args.fused_bwd_block,
                    interpret=on_cpu,  # Pallas kernels compile on TPU only
                )
            else:
                batch_loss_fn = functools.partial(
                    kernel_losses[args.kernel],
                    interpret=on_cpu,
                )
        if args.shared_negatives:
            if args.kernel not in ("dense", "fused_fwd"):
                raise SystemExit(
                    "--shared_negatives requires --kernel dense or "
                    "fused_fwd")
            batch_loss_fn = mpqe_mod.make_shared_negs_batch_loss(
                args.shared_negatives,
                encoder="fused_fwd" if args.kernel == "fused_fwd"
                else "dense",
                fused_block=args.fused_block,
                fused_backward=args.fused_backward,
                fused_bwd_block=args.fused_bwd_block,
                interpret=on_cpu,
                self_adv_tau=args.self_adv_tau)
        elif args.self_adv_tau:
            raise SystemExit("--self_adv_tau requires --shared_negatives")
    else:
        if args.kernel != "dense":
            raise SystemExit("--kernel applies to --model rgcn only")
        if args.shared_negatives:
            raise SystemExit("--shared_negatives requires --model rgcn")
        if args.self_adv_tau:
            raise SystemExit("--self_adv_tau requires --model rgcn "
                             "--shared_negatives")
        from mpqe_tpu.models import gqe as gqe_mod
        cfg = gqe_mod.GQEConfig(
            n_entities=kg.n_entities,
            n_modes=kg.n_modes,
            n_rels=kg.n_rels,
            embed_dim=args.embed_dim,
            decoder=args.decoder,
            intersection=args.intersection,
            soft_and=args.model == "gqe_softand",
            encoder=args.gqe_encoder,
            aggregator=args.gqe_aggregator,
            bibox_w=args.bibox_w,
            margin=args.margin,
            dtype=jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32,
        )
        init_fn = gqe_mod.init_gqe
        batch_loss_fn = gqe_mod.dense_batch_loss
        if args.gqe_encoder == "neighborhood":
            from mpqe_tpu.models import aggregators as agg_mod

            # the table rides as a TRACED argument of the train step
            # (loss_consts below) — partial-binding it into the jitted
            # loss would bake [n_entities, fanout] into the HLO and
            # overflow the remote-relay compile request (CLAUDE.md)
            neighbor_table = agg_mod.build_neighbor_table_device(
                kg, fanout=args.gqe_fanout, seed=args.seed)
    tc = loop_mod.TrainConfig(
        lr=args.lr, batch_size=args.batch_size, n_neg=args.n_neg,
        max_steps=args.steps, val_every=args.val_every,
        patience=args.patience, seed=args.seed,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        optimizer=args.optimizer, grad_clip_norm=args.grad_clip,
        weight_decay=args.weight_decay, hard_margin=args.hard_margin,
    )
    metrics.write_config(dataclasses.asdict(cfg), "model_config.json")

    train_step = None
    multi_step = None
    if args.parallel != "none":
        if args.model != "rgcn":
            raise SystemExit("--parallel requires --model rgcn")
        if args.kernel != "dense":
            raise SystemExit(
                "--kernel {fused,blocked} is single-chip for now; the "
                "distributed steps (--parallel) own their own layer path")
        if args.shared_negatives:
            raise SystemExit(
                "--shared_negatives is single-chip for now; the "
                "distributed steps own their own loss")
        from mpqe_tpu.parallel import mesh as mesh_lib

        shape = (tuple(int(x) for x in args.mesh.split(","))
                 if args.mesh else (len(jax.devices()), 1))
        mesh = mesh_lib.make_mesh(
            shape, devices=jax.devices()[: shape[0] * shape[1]])
        metrics.log({"event": "mesh", "shape": dict(mesh.shape)})
        if args.parallel == "spmd":
            from mpqe_tpu.parallel import spmd as spmd_lib

            _, train_step = spmd_lib.make_spmd_train_step(
                cfg, tc, mesh, shard_entity_table=True)
            if args.steps_per_call > 1:
                _, multi_step = spmd_lib.make_spmd_multistep_train_step(
                    cfg, tc, mesh, shard_entity_table=True)
        else:
            from mpqe_tpu.parallel import halo_train

            kind = ("ring" if args.parallel == "halo_ring" else "gather")
            train_step = halo_train.make_halo_train_step(
                cfg, tc, mesh, layer_kind=kind)
            if args.steps_per_call > 1:
                multi_step = halo_train.make_halo_multistep_train_step(
                    cfg, tc, mesh, layer_kind=kind)

    state = loop_mod.init_train_state(
        jax.random.PRNGKey(args.seed), cfg, tc,
        init_fn=init_fn if args.model != "rgcn" else None,
    )
    ckpt_dir = os.path.join(run_dir, "ckpt")
    if args.resume:
        latest = ckpt_mod.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt_mod.restore_checkpoint(latest, state)
            metrics.log({"step": state.step, "event": "resumed",
                         "path": latest})
        else:
            metrics.log({"event": "resume_requested_no_checkpoint"})

    manager = ckpt_mod.CheckpointManager(ckpt_dir, keep_best=args.keep_best)

    def checkpoint_fn(st, metric):
        # async: the commit overlaps the next training steps
        path = manager.save(st, metric=metric)
        metrics.log({"step": st.step, "event": "checkpoint",
                     "path": path, "val_auc": metric})

    # reference protocol: 1-chain training covers the train graph's edges.
    # If the dataset shipped no train_edges.pkl, derive the edge set from
    # the KG arrays (zero per-edge Python objects; fallback negatives are
    # sampled on the fly by the packers).
    train_stores = None
    want_1chain = (args.structures in ("all", "chains")
                   or "1-chain" in args.structures.split(","))
    if args.data.startswith("pkl:") and want_1chain \
            and "1-chain" not in train_q:
        from mpqe_tpu.data.store import build_stores, stores_from_edges

        train_stores = build_stores(train_q, kg=kg)
        train_stores.update(stores_from_edges(kg))
        metrics.log({"event": "raw_edge_1chain_derived",
                     "edge_queries": sum(
                         s.n_queries for s in train_stores["1-chain"])})

    # graceful preemption: SIGTERM (maintenance events, job schedulers)
    # stops the loop at the next step boundary; the normal final
    # checkpoint below then makes the run --resume-able, and the clean
    # exit code 0 tells tools/resilient_train.py NOT to relaunch
    stop_event = threading.Event()
    prev_sigterm, installed_sigterm = None, False
    if threading.current_thread() is threading.main_thread():
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda s, f: stop_event.set())
        installed_sigterm = True

    try:
        state = loop_mod.run_train(
            state, cfg, tc, train_q, val_queries=val_q,
            should_stop=stop_event.is_set,
            log_fn=metrics.log, checkpoint_fn=checkpoint_fn,
            train_step=train_step,
            multi_step=multi_step,
            batch_loss_fn=batch_loss_fn,
            loss_consts=({"neighbor_table": neighbor_table}
                         if neighbor_table is not None else None),
            kg=kg, warmup=args.warmup, prefetch=args.prefetch,
            steps_per_call=args.steps_per_call,
            train_stores=train_stores,
            neighbor_table=neighbor_table,
            trace=((args.trace_skip, args.trace,
                    os.path.join(run_dir, "trace"))
                   if args.trace > 0 else None),
        )
        # always save a final checkpoint (best-val checkpoints only exist
        # when validation ran during training); metric-less saves are
        # never pruned.  The handler stays installed until the save
        # commits: a second SIGTERM in the grace window must keep being
        # swallowed, not kill the process mid-save with a nonzero rc the
        # supervisor would read as a crash.
        final_path = manager.save(state, wait=True)
        manager.close()
        metrics.log({"step": state.step, "event": "final_checkpoint",
                     "path": final_path})
    finally:
        # ALWAYS uninstall (even when run_train raises): the lambda
        # closes over THIS run's stop_event — leaking it would make a
        # later SIGTERM set a dead event instead of terminating
        if installed_sigterm:
            signal.signal(signal.SIGTERM,
                          prev_sigterm if prev_sigterm is not None
                          else signal.SIG_DFL)
    if stop_event.is_set():
        # preempted: the full final eval can outlast the grace window
        # (minutes at scale) — exit promptly; --resume picks up from the
        # checkpoint just saved
        metrics.log({"step": state.step, "event": "preempt_exit"})
        print(f"preempted at step={state.step}; checkpoint saved "
              f"({final_path})")
        metrics.close()
        return state
    # batched single-sweep final eval (per-query-relation encoders exist
    # for both MPQE layer kinds and the GQE baselines)
    res = evaluation.evaluate_batched(
        state.params, cfg, evaluation.make_eval_set(val_q),
        neighbor_table=neighbor_table)
    metrics.log({"step": state.step, "final": res.flat()})
    print(f"final step={state.step} macro_auc={res.macro_auc:.4f} "
          f"macro_apr={res.macro_apr:.2f}")
    metrics.close()
    return state


if __name__ == "__main__":
    main()
