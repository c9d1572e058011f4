#!/usr/bin/env python
"""Diagnose the anomalous MLP (deep-sets) readout quality (VERDICT r3
missing #5): band-substrate macro AUC was 0.661 vs sum 0.940 while the
paper's MLP readout is competitive.

Hypotheses tested on a reduced band protocol (same data for every arm):
  sum        — control (the pooled input the MLP transforms)
  mlp        — current init (w_pre/w_post ~ N(0, 1/d))
  mlp_id     — w_post initialized near identity (I + small noise): the
               readout STARTS as the sum readout and learns a delta;
               pure reparameterization of the same function class
  mlp_he     — He-scaled w_pre (sqrt(2/d)) for the relu layer
  mlp_mean   — mean pooling instead of sum (scale control)
  mlp_lr3e-3 — lower lr arm (optimization-instability control)

Writes one JSON line per arm; CPU-only, deterministic.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mpqe_tpu.data.sampler import QuerySampler, make_rule_kg  # noqa: E402
from mpqe_tpu.models import mpqe as mpqe_mod  # noqa: E402
from mpqe_tpu.models import readout as readout_mod  # noqa: E402
from mpqe_tpu.queries import STRUCTURE_NAMES, group_queries_by_formula  # noqa: E402
from mpqe_tpu.train import evaluation  # noqa: E402
from mpqe_tpu.train import loop as loop_mod  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_data(args):
    kg = make_rule_kg(n_entities=args.entities, n_modes=3, n_base_rels=6,
                      out_degree=2, seed=args.seed, variant="band")
    sampler = QuerySampler(kg, seed=args.seed + 1)
    train_q = sampler.all_edge_queries(n_neg=32)
    seen = set()
    for s in STRUCTURE_NAMES:
        if s == "1-chain":
            continue
        qs = sampler.sample_queries(s, args.train_per_structure, n_neg=32,
                                    n_hard_neg=16)
        train_q += qs
        seen.update((q.formula.structure, q.formula.rels, q.anchors,
                     q.target) for q in qs)
    val_q = []
    for s in STRUCTURE_NAMES:
        if s == "1-chain":
            continue
        got = 0
        while got < args.val_per_structure:
            q = sampler.sample_query(s, n_neg=64, n_hard_neg=32)
            key = (q.formula.structure, q.formula.rels, q.anchors, q.target)
            if key in seen:
                continue
            seen.add(key)
            val_q.append(q)
            got += 1
    return kg, group_queries_by_formula(train_q), group_queries_by_formula(val_q)


def run_arm(arm, kg, train_q, val_q, args):
    readout = "sum" if arm == "sum" else "mlp"
    lr = 3e-3 if arm == "mlp_lr3e-3" else args.lr
    tc = loop_mod.TrainConfig(
        lr=lr, lr_schedule="cosine", batch_size=args.batch_size,
        n_neg=args.n_neg, max_steps=args.steps,
        val_every=max(args.steps // 4, 1), patience=100, seed=args.seed)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=args.dim, n_layers=3, num_bases=args.bases or None,
        readout=readout)
    state = loop_mod.init_train_state(jax.random.PRNGKey(args.seed), cfg, tc)

    if arm == "mlp_id":
        d = args.dim
        ro = dict(state.params["readout"])
        ro["w_post"] = (jnp.eye(d, dtype=ro["w_post"].dtype)
                        + 0.05 * ro["w_post"])
        # w_pre near identity too: h = relu(x) keeps the positive half of
        # the signal the sum readout pools
        ro["w_pre"] = (jnp.eye(d, dtype=ro["w_pre"].dtype)
                       + 0.05 * ro["w_pre"])
        state.params = {**state.params, "readout": ro}
    elif arm == "mlp_he":
        d = args.dim
        ro = dict(state.params["readout"])
        k = jax.random.PRNGKey(args.seed + 77)
        ro["w_pre"] = jax.random.normal(k, (d, d), ro["w_pre"].dtype) * \
            jnp.sqrt(2.0 / d)
        state.params = {**state.params, "readout": ro}
    elif arm == "mlp_mean":
        # patch: mean pooling (restored after the arm)
        orig = readout_mod.readout_dense

        def patched(kind, params, x, target_slot):
            if kind == "mlp":
                h = jax.nn.relu(
                    jnp.einsum("bnd,do->bno", x, params["w_pre"])
                    + params["b_pre"])
                pooled = jnp.mean(h, axis=1)
                return jnp.dot(pooled, params["w_post"]) + params["b_post"]
            return orig(kind, params, x, target_slot)

        readout_mod.readout_dense = patched

    try:
        state = loop_mod.run_train(state, cfg, tc, train_q,
                                   val_queries=val_q, kg=kg)
        res = evaluation.evaluate(state.params, cfg, val_q, n_neg=64)
        train_sub = {
            qt: {f: qs[:20] for f, qs in list(by_f.items())[:4]}
            for qt, by_f in train_q.items() if qt != "1-chain"}
        train_res = evaluation.evaluate(state.params, cfg, train_sub,
                                        n_neg=32)
    finally:
        if arm == "mlp_mean":
            readout_mod.readout_dense = orig
    row = {
        "arm": arm, "readout": readout, "lr": lr,
        "val_auc_macro": res.macro_auc, "val_apr_macro": res.macro_apr,
        "train_auc_macro": train_res.macro_auc,
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=600)
    ap.add_argument("--train_per_structure", type=int, default=800)
    ap.add_argument("--val_per_structure", type=int, default=100)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--n_neg", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--bases", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default="sum,mlp,mlp_id,mlp_he,mlp_mean,mlp_lr3e-3")
    args = ap.parse_args(argv)
    kg, train_q, val_q = build_data(args)
    log(f"KG: {kg.n_entities} entities, {kg.n_rels} rels")
    for arm in args.arms.split(","):
        log(f"=== arm {arm}")
        run_arm(arm, kg, train_q, val_q, args)


if __name__ == "__main__":
    main()
