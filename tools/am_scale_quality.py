#!/usr/bin/env python
"""AM-scale 3-chain_inter APR — the driver's north-star quality metric
(BASELINE.json "3-chain_inter APR on AM") at the AM dataset's scale:
~2M entities / ~20M directed edges (VERDICT r2 item 6).

No real AM bytes exist offline (the reference mount is empty), so the KG
is the C++ host runtime's schema-respecting synthetic at AM shape.  The
whole run is TPU-native and device-resident:

  * KG generation + incoming-CSR + backward-walk query sampling run in
    the C++ host runtime (tools/big_kg_demo.py's path);
  * the ENTIRE query bank then moves to HBM once (~100 MB beside the
    1 GB entity table) and training runs as ``lax.fori_loop`` dispatches
    that gather each batch ON DEVICE — zero host->device traffic in the
    hot loop, which matters doubly over the relay (tools/
    e2e_train_bench.py measured the relay link at ~100 MB/s);
  * per-query relations go through ``encode_dense_multi`` so one
    compiled program trains every sampled formula (no per-formula
    stores — at 32 directed rels a 3-edge structure has ~3e4 live
    formulas, useless as separate dense-template programs);
  * curriculum: 1-chain burn-in straight from a device-resident
    directed-edge bank (negatives drawn on device from the target's
    contiguous mode block — the native sampler's uniform convention),
    then the 3-chain_inter phase.

Eval: held-out queries (deduped against the train bank by row hash),
APR = per-query percentile of the true answer among its sampled
same-mode negatives (train/evaluation.py protocol).

Usage (defaults reproduce the BASELINE.md row):
  python tools/am_scale_quality.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpqe_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()  # honor JAX_PLATFORMS=cpu in-process (CLAUDE.md)

import numpy as np


def dedup_against(train_ents, train_rels, val_ents, val_rels):
    """Drop val rows whose (entities, rels) tuple appears in train."""
    def keys(e, r):
        flat = np.concatenate([e, r], axis=1).astype(np.uint64)
        # order-sensitive polynomial row hash (vectorized)
        h = np.zeros(flat.shape[0], np.uint64)
        for c in range(flat.shape[1]):
            h = h * np.uint64(0x100000001B3) + flat[:, c]
        return h

    seen = np.unique(keys(train_ents, train_rels))
    return ~np.isin(keys(val_ents, val_rels), seen)


class RuleOracle:
    """Exact query answer sets from the KG's forward adjacency — the
    measured APR ceiling + hard negatives for rule-structured KGs
    (round-4 VERDICT items 3/9).

    Works on ANY KnowledgeGraph: builds a sorted (rel, head) -> tails
    index over the base (forward) triples and runs the query DAG's
    closure per eval query.  Hard negatives follow the reference
    convention (SURVEY.md §A.4): entities satisfying a strict subset of
    the query's conjuncts — computed as the union of answer sets with
    one edge dropped (drops that disconnect the target are skipped),
    minus the true answer set.
    """

    def __init__(self, kg):
        heads = np.asarray(kg.heads, np.int64)
        rels = np.asarray(kg.rels, np.int64)
        tails = np.asarray(kg.tails, np.int64)
        # DIRECTED relation ids, matching the native sampler's CSR
        # convention (cpp build_incoming_csr): forward (h, r, t) is rel
        # 2r from h; inverse is 2r+1 from t
        k_fwd = (2 * rels) * np.int64(kg.n_entities) + heads
        k_inv = (2 * rels + 1) * np.int64(kg.n_entities) + tails
        key = np.concatenate([k_fwd, k_inv])
        dst = np.concatenate([tails, heads]).astype(np.int32)
        order = np.argsort(key, kind="stable")
        self.key = key[order]
        self.tails = dst[order]
        self.n_ent = kg.n_entities
        self.entity_mode = np.asarray(kg.entity_mode)

    def out(self, h: int, r: int) -> np.ndarray:
        k = np.int64(r) * self.n_ent + np.int64(h)
        lo = np.searchsorted(self.key, k, side="left")
        hi = np.searchsorted(self.key, k, side="right")
        return self.tails[lo:hi]

    def outs(self, hs: np.ndarray, r: int) -> np.ndarray:
        if hs.size == 0:
            return hs.astype(np.int32)
        return np.unique(np.concatenate([self.out(int(h), r)
                                         for h in hs]))

    def answers(self, spec, ents: np.ndarray, rels: np.ndarray,
                drop_edge: int = -1) -> np.ndarray:
        """Closure answer set at the target (base-relation ids only:
        the samplers emit forward relations for these structures)."""
        cand = {}
        for s in spec.anchor_slots:
            cand[s] = np.asarray([ents[s]], np.int32)
        pending = [j for j in range(spec.n_edges) if j != drop_edge]
        while pending:
            nxt = []
            for j in pending:
                s, d = spec.edge_src[j], spec.edge_dst[j]
                if s not in cand:
                    nxt.append(j)
                    continue
                reach = self.outs(cand[s], int(rels[j]))
                cand[d] = (reach if d not in cand
                           else np.intersect1d(cand[d], reach))
            if len(nxt) == len(pending):
                break  # remaining edges disconnected from anchors
            pending = nxt
        return cand.get(spec.target_slot,
                        np.empty(0, np.int32)).astype(np.int32)

    def hard_negatives(self, spec, ents, rels, n_hard: int,
                       rng) -> np.ndarray:
        """Up to n_hard entities satisfying a strict subset of the
        conjuncts (one-edge-dropped closures minus the full answers);
        -1-padded."""
        full = self.answers(spec, ents, rels)
        pool = []
        for j in range(spec.n_edges):
            a = self.answers(spec, ents, rels, drop_edge=j)
            if a.size:
                pool.append(a)
        out = np.full(n_hard, -1, np.int32)
        if not pool:
            return out
        cand = np.setdiff1d(np.unique(np.concatenate(pool)), full)
        if cand.size == 0:
            return out
        take = min(n_hard, cand.size)
        out[:take] = rng.choice(cand, size=take, replace=False)
        return out


_POOL_CTX = {}


def _hard_chunk(task):
    lo, hi, n_hard, seed = task
    oracle, spec = _POOL_CTX["oracle"], _POOL_CTX["spec"]
    ents, rels = _POOL_CTX["ents"], _POOL_CTX["rels"]
    rng = np.random.default_rng(seed)
    out = np.full((hi - lo, n_hard), -1, np.int32)
    for i in range(lo, hi):
        out[i - lo] = oracle.hard_negatives(
            spec, ents[i], rels[i], n_hard, rng)
    return out


def build_hard_bank(oracle, spec, ents, rels, n_hard, seed, procs=None):
    """[n, n_hard] strict-subset hard negatives (-1-padded) for a block
    of sampled queries, fork-parallel: the oracle's sorted 2x-edges
    index (~1 GB at 64M directed edges) is COW-shared with workers, so
    the build runs at ~n_cpus x the eval oracle's ~4 ms/query."""
    import multiprocessing as mp

    n = int(ents.shape[0])
    _POOL_CTX.update(oracle=oracle, spec=spec, ents=ents, rels=rels)
    procs = procs or (os.cpu_count() or 1)
    chunk = max(256, -(-n // (procs * 8)))
    tasks = [(lo, min(lo + chunk, n), n_hard, seed + 13 * lo)
             for lo in range(0, n, chunk)]
    try:
        if procs == 1 or len(tasks) == 1:
            parts = [_hard_chunk(t) for t in tasks]
        else:
            with mp.get_context("fork").Pool(procs) as pool:
                parts = pool.map(_hard_chunk, tasks)
    finally:
        _POOL_CTX.clear()
    return np.concatenate(parts, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=2_000_000)
    ap.add_argument("--modes", type=int, default=8)
    ap.add_argument("--base_rels", type=int, default=16)
    ap.add_argument("--triples", type=int, default=10_000_000,
                    help="undirected triples (directed edges = 2x)")
    ap.add_argument("--kg", default="random", choices=["random", "band_seg"],
                    help="random = schema-respecting synthetic (the r3 "
                         "row; random-KG ceiling applies); band_seg = "
                         "rule-structured segment-band KG (high, "
                         "MEASURED ceiling — the rules determine exact "
                         "answer sets)")
    ap.add_argument("--seg_width", type=int, default=8)
    ap.add_argument("--eval_oracle", action="store_true",
                    help="compute exact answer sets for the held-out "
                         "queries: APR ceiling under the sampled "
                         "negatives + hard negatives (reference "
                         "strict-subset convention)")
    ap.add_argument("--n_hard_eval", type=int, default=32)
    ap.add_argument("--train_shared_negs", type=int, default=0,
                    metavar="K",
                    help="full phase scores each query against K batch-"
                         "shared uniform candidates (one [B,d]@[d,K] "
                         "matmul) IN ADDITION to its per-query "
                         "negatives — with 4 uniform negatives of 2M "
                         "entities the margin saturates by step 500 "
                         "(loss ~1e-5, measured round 4) and training "
                         "signal dies; 0 = off")
    ap.add_argument("--train_shared_strat", action="store_true",
                    help="draw the shared candidates stratified over "
                         "mode blocks (K/n_modes per mode) instead of "
                         "uniform over all entities — at 2M entities / "
                         "8 modes a uniform draw is ~7/8 cross-mode "
                         "(trivially easy once mode structure is "
                         "learned), so stratification concentrates the "
                         "sweep where margin signal lives; composes "
                         "with --train_self_adv")
    ap.add_argument("--train_self_adv", type=float, default=0.0,
                    metavar="TAU",
                    help="self-adversarial weighting of the shared "
                         "candidate sweep (RotatE convention, "
                         "arXiv:1902.10197 §3.1): each query's "
                         "candidate violations are weighted by "
                         "softmax(TAU * score) with stop_gradient, so "
                         "the margin push concentrates on the "
                         "candidates the model currently ranks "
                         "highest — which, once mode/reachability "
                         "structure is learned, are exactly the "
                         "strict-subset hard negatives the uniform "
                         "sweep dilutes (BASELINE.md hard-APR row); "
                         "0 = uniform weighting (round-4 baseline)")
    ap.add_argument("--train_hard_negs", type=int, default=0,
                    metavar="K",
                    help="train against K SAMPLED strict-subset hard "
                         "negatives per query (reference convention, "
                         "SURVEY.md §A.4 margin_loss hard_negatives): a "
                         "[--hard_bank, K] bank of exact one-edge-"
                         "dropped closure satisfiers is packed host-"
                         "side (RuleOracle, fork-parallel) and a hard-"
                         "negative margin term joins every full-phase "
                         "step.  Round 4 MEASURED that nothing else "
                         "closes the hard-APR gap at 2M (re-weighting / "
                         "stratifying uniform candidates cannot "
                         "manufacture subset satisfiers, docs/quality/"
                         "quality4_hard_negs.md); 0 = off")
    ap.add_argument("--hard_bank", type=int, default=131_072,
                    help="train queries given an oracle hard-negative "
                         "row (~4 ms/query host-side at 2M; fork-"
                         "parallel over CPUs)")
    ap.add_argument("--hard_weight", type=float, default=1.0,
                    help="weight of the hard-negative margin term "
                         "(the main loop's hard_neg_prob=0.5 coin flip "
                         "in expectation == always-on at weight 0.5; "
                         "1.0 trains every step at full strength)")
    ap.add_argument("--hard_batch", type=int, default=0,
                    help="batch for the hard term (0 = --batch_size)")
    ap.add_argument("--hard_margin", type=float, default=0.0,
                    help="margin for the hard-negative term (0 = "
                         "cfg.margin).  Subset satisfiers share all-but-"
                         "one conjunct with true answers, so demanding "
                         "the full cosine margin (1.0 on [-1,1] scores) "
                         "never saturates and the relu gradient distorts "
                         "the whole encoder (measured: 20k APR 98.3 -> "
                         "78.7 at margin 1.0 / weight 1.0); ranking only "
                         "needs pos > neg, so a small margin suffices")
    ap.add_argument("--hard_start", type=float, default=0.0,
                    help="fraction of full-phase steps before the hard "
                         "term switches on (curriculum: uniform "
                         "structure first, subset boundary last)")
    ap.add_argument("--eval_train_hard", action="store_true",
                    help="also score the TRAIN hard bank in-sample "
                         "(train_hard_apr): distinguishes 'cannot fit "
                         "the subset boundary' (low) from 'fits but "
                         "does not generalize' (high, eval hard_apr "
                         "low) — the round-5 diagnostic for the "
                         "measured null at 2M and 20k")
    ap.add_argument("--train_queries", type=int, default=1_000_000)
    ap.add_argument("--val_queries", type=int, default=16_384)
    ap.add_argument("--edge_bank", type=int, default=4_000_000,
                    help="directed edges device-resident for 1-chain")
    ap.add_argument("--structure", default="3-chain_inter")
    ap.add_argument("--model", default="rgcn", choices=["rgcn", "gqe"],
                    help="rgcn = MPQE; gqe = the bilinear+deepsets "
                         "baseline under the identical protocol/banks")
    ap.add_argument("--gqe_decoder", default="bilinear",
                    choices=["bilinear", "transe", "distmult", "box",
                             "bibox"],
                    help="GQE arm decoder; 'box' = Query2Box geometry "
                         "(round-5 extension targeting the measured "
                         "hard-negative generalization limit); "
                         "'bibox' = bilinear point head + box head over "
                         "a shared entity table, fused score")
    ap.add_argument("--bibox_w", type=float, default=1.0,
                    help="bibox: weight of the box-affinity term in "
                         "the fused cosine+box score")
    ap.add_argument("--batch_size", type=int, default=65_536)
    ap.add_argument("--n_neg", type=int, default=4)
    ap.add_argument("--n_neg_eval", type=int, default=64)
    ap.add_argument("--burn_in_steps", type=int, default=3000)
    ap.add_argument("--steps", type=int, default=12_000)
    ap.add_argument("--steps_per_call", type=int, default=500)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--bases", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.003)
    ap.add_argument("--structure_weights", default="",
                    help="full-phase dispatch weights for the mixed "
                         "curriculum, e.g. '3-chain=3,2-chain=2' "
                         "(unlisted structures weight 1): structure s "
                         "gets w_s dispatches per round-robin cycle. "
                         "Round-5 lever for the chain-depth weakness "
                         "in the 2M mix (3-chain 0.76 of ceiling with "
                         "1/7 of the steps)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mpqe_tpu.data import native
    if not native.ensure_built():
        raise SystemExit("C++ host library unavailable")

    t0 = time.perf_counter()
    if args.kg == "band_seg":
        from mpqe_tpu.data.sampler import make_rule_kg

        kg = make_rule_kg(
            n_entities=args.entities, n_modes=args.modes,
            n_base_rels=args.base_rels, seed=args.seed,
            variant="band_seg", seg_width=args.seg_width)
    else:
        kg = native.make_synthetic_kg_native(
            args.entities, args.modes, args.base_rels, args.triples,
            seed=args.seed)
    print(json.dumps({"phase": "kg_gen", "kg": args.kg,
                      "entities": int(kg.n_entities),
                      "triples": int(kg.n_triples),
                      "directed_edges": int(2 * kg.n_triples),
                      "seconds": time.perf_counter() - t0}), flush=True)

    from mpqe_tpu.queries import STRUCTURES as _STRUCTURES

    structures = (list(_STRUCTURES) if args.structure == "all"
                  else [s.strip() for s in args.structure.split(",")])

    t0 = time.perf_counter()
    csr = native.build_incoming_csr_native(kg)
    tr, va = {}, {}
    for s in structures:
        t = native.sample_queries_native(
            kg, s, args.train_queries, n_neg=args.n_neg,
            seed=args.seed + 1, csr=csr)
        v = native.sample_queries_native(
            kg, s, 2 * args.val_queries, n_neg=args.n_neg_eval,
            seed=args.seed + 2, csr=csr)
        t = {k: x[t["entities"][:, 0] >= 0] for k, x in t.items()}
        v = {k: x[v["entities"][:, 0] >= 0] for k, x in v.items()}
        keep = dedup_against(t["entities"], t["rels"],
                             v["entities"], v["rels"])
        v = {k: x[keep][: args.val_queries] for k, x in v.items()}
        tr[s], va[s] = t, v
        print(json.dumps({"phase": "sampling", "structure": s,
                          "train": int(t["entities"].shape[0]),
                          "val_heldout": int(v["entities"].shape[0]),
                          "seconds": time.perf_counter() - t0}),
              flush=True)

    # oracle + hard-bank build run HERE, before the first device op:
    # the fork-pool must not fork a live XLA backend (numpy-only work)
    oracle = None
    if args.eval_oracle or args.train_hard_negs:
        t0 = time.perf_counter()
        oracle = RuleOracle(kg)
        print(json.dumps({"phase": "oracle_build",
                          "seconds": time.perf_counter() - t0}),
              flush=True)
    hard_np = {}
    if args.train_hard_negs:
        for s in structures:
            t0 = time.perf_counter()
            spec_s = _STRUCTURES[s]
            n_hb = min(args.hard_bank, int(tr[s]["entities"].shape[0]))
            h = build_hard_bank(oracle, spec_s, tr[s]["entities"][:n_hb],
                                tr[s]["rels"][:n_hb],
                                args.train_hard_negs,
                                seed=args.seed + 17)
            has = (h >= 0).any(axis=1)
            print(json.dumps({"phase": "hard_bank", "structure": s,
                              "queries": int(has.sum()),
                              "requested": n_hb,
                              "n_hard": args.train_hard_negs,
                              "fill": float((h[has] >= 0).mean())
                              if has.any() else 0.0,
                              "seconds": time.perf_counter() - t0}),
                  flush=True)
            if has.any():
                hard_np[s] = {"ents": tr[s]["entities"][:n_hb][has],
                              "rels": tr[s]["rels"][:n_hb][has],
                              "hard": h[has]}
        if not hard_np:
            raise SystemExit("--train_hard_negs: no sampled query has "
                             "a strict-subset satisfier on this KG")

    import jax
    import jax.numpy as jnp
    import optax

    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.queries import STRUCTURES
    from mpqe_tpu.train.evaluation import _apr_percentiles

    if args.model == "gqe":
        from mpqe_tpu.models import gqe as gqe_mod

        cfg = gqe_mod.GQEConfig(
            n_entities=kg.n_entities, n_modes=kg.n_modes,
            n_rels=kg.n_rels, embed_dim=args.dim,
            decoder=args.gqe_decoder, intersection="deepsets",
            bibox_w=args.bibox_w,
        )
        params = gqe_mod.init_gqe(jax.random.PRNGKey(args.seed), cfg)
    else:
        cfg = mpqe_mod.MPQEConfig(
            n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
            embed_dim=args.dim, n_layers=args.layers, num_bases=args.bases,
            readout="tgt",
        )
        params = mpqe_mod.init_mpqe(jax.random.PRNGKey(args.seed), cfg)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    # ---- device-resident banks -------------------------------------
    entity_mode = jnp.asarray(kg.entity_mode)  # [n_entities] int32
    mode_start = jnp.asarray(np.searchsorted(
        kg.entity_mode, np.arange(kg.n_modes + 1)).astype(np.int32))
    banks = {}
    for s in structures:
        banks[s] = {
            "ents": jnp.asarray(tr[s]["entities"]),   # [N, n_nodes]
            "rels": jnp.asarray(tr[s]["rels"]),       # [N, n_edges]
            "negs": jnp.asarray(tr[s]["negatives"]),  # [N, n_neg]
        }
        if s in hard_np:
            banks[s]["h_ents"] = jnp.asarray(hard_np[s]["ents"])
            banks[s]["h_rels"] = jnp.asarray(hard_np[s]["rels"])
            banks[s]["h_hard"] = jnp.asarray(hard_np[s]["hard"])
    src, rel, dst = kg.directed_edges()
    rng = np.random.default_rng(args.seed + 3)
    pick = rng.choice(src.shape[0], size=min(args.edge_bank, src.shape[0]),
                      replace=False)
    ebank = {"src": jnp.asarray(src[pick]), "rel": jnp.asarray(rel[pick]),
             "dst": jnp.asarray(dst[pick])}
    B, K = args.batch_size, args.n_neg
    N_e = int(ebank["src"].shape[0])
    Bh = args.hard_batch or B

    # model-agnostic (pos [B], neg [B, K]) scores — both models train
    # and evaluate through the identical protocol/banks
    if args.model == "gqe":
        def pos_neg(p, structure, ne, nm, er, tgt, neg):
            return gqe_mod.score_pos_neg(p, cfg, structure, ne, er,
                                         tgt, neg)

        if args.train_shared_negs and cfg.soft_and:
            raise SystemExit("--train_shared_negs: SoftAnd's conjunct-"
                             "min scoring has no single query vector "
                             "to sweep")

        def encode_for_sweep(p, structure, ne, nm, er):
            return gqe_mod.encode_dense_multi(p, cfg, structure,
                                              ne, nm, er, None)

        def sweep_scores(q, rows):
            # box decoder: L1 box distances against the candidate rows
            # (no cosine normalization — box scores are distances)
            if cfg.decoder == "box":
                return gqe_mod.box_score_rows(cfg, q, rows)
            if cfg.decoder == "bibox":
                return gqe_mod.bibox_score_rows(cfg, q, rows)
            return _cosine_sweep(cfg, q, rows)
    else:
        def pos_neg(p, structure, ne, nm, er, tgt, neg):
            en = jnp.ones(er.shape, jnp.float32)
            q = mpqe_mod.encode_dense_multi(p, cfg, structure,
                                            ne, nm, er, en)
            ent = p["emb"]["ent"]
            return (mpqe_mod.score(cfg, q, ent[tgt]),
                    mpqe_mod.score(cfg, q[:, None, :], ent[neg]))

        def encode_for_sweep(p, structure, ne, nm, er):
            en = jnp.ones(er.shape, jnp.float32)
            return mpqe_mod.encode_dense_multi(p, cfg, structure,
                                               ne, nm, er, en)

        def sweep_scores(q, rows):
            return _cosine_sweep(cfg, q, rows)

    def _cosine_sweep(cfg_, q, rows):
        qf = q.astype(jnp.float32)
        rf = rows.astype(jnp.float32)
        if cfg_.scale_scores:
            qf = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True)
                       + 1e-12)
            rf = rf / (jnp.linalg.norm(rf, axis=-1, keepdims=True)
                       + 1e-12)
        return jnp.dot(qf, rf.T, preferred_element_type=jnp.float32)

    def _margin_pn(pos, neg):  # all-real masks
        return jnp.mean(jax.nn.relu(cfg.margin - pos[:, None] + neg))

    def multi_loss(p, structure, ne, nm, er, tgt, neg, shared=None):
        pos, ng = pos_neg(p, structure, ne, nm, er, tgt, neg)
        loss = _margin_pn(pos, ng)
        if shared is not None:
            # batch-shared candidate sweep: one [B, d] @ [d, K] matmul;
            # mask candidates that ARE some query's positive target
            q = encode_for_sweep(p, structure, ne, nm, er)
            rows = p["emb"]["ent"][shared]
            pos2 = pos[:, None]
            sc = sweep_scores(q, rows)
            viol = jax.nn.relu(cfg.margin - pos2 + sc)
            w = (shared[None, :] != tgt[:, None]).astype(viol.dtype)
            if args.train_self_adv > 0.0:
                # per-query softmax over candidates (masked pairs at
                # -inf), weights stop-gradiented per the RotatE recipe
                logits = jnp.where(w > 0, args.train_self_adv * sc,
                                   -jnp.inf)
                p_adv = jax.lax.stop_gradient(
                    jax.nn.softmax(logits, axis=1))
                per_q = jnp.sum(jnp.where(w > 0, p_adv * viol, 0.0),
                                axis=1)
                loss = loss + jnp.mean(per_q)
            else:
                loss = loss + (jnp.sum(viol * w)
                               / jnp.maximum(jnp.sum(w), 1.0))
        return loss

    def chain_loss(p, emode, anchor, r, tgt, neg):
        ne = jnp.stack([anchor, tgt], axis=1)
        return _margin_pn(*pos_neg(p, "1-chain", ne, emode[ne],
                                   r[:, None], tgt, neg))

    # the banks are ARGUMENTS of the jitted phase functions, never
    # closures — closure-captured jnp arrays become HLO constants, which
    # overflows the relay compile request at this size (CLAUDE.md)
    def make_chain_phase():
        def run(p, o, data, emode, mstart, start, n):
            def body(i, carry):
                p, o, _ = carry
                key = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 7), i)
                k_idx, k_neg = jax.random.split(key)
                idx = jax.random.randint(k_idx, (B,), 0, N_e)
                tgt = data["dst"][idx]
                lo = mstart[emode[tgt]]
                width = mstart[emode[tgt] + 1] - lo
                u = jax.random.randint(k_neg, (B, K), 0, 1 << 30)
                neg = lo[:, None] + (u % width[:, None])

                def loss_fn(pp):
                    return chain_loss(pp, emode, data["src"][idx],
                                      data["rel"][idx], tgt, neg)

                l, g = jax.value_and_grad(loss_fn)(p)
                up, o = opt.update(g, o, p)
                return optax.apply_updates(p, up), o, l

            return jax.lax.fori_loop(start, start + n, body,
                                     (p, o, jnp.float32(0)))

        return jax.jit(run, static_argnums=(6,), donate_argnums=(0, 1))

    def make_multi_phase(s):
        spec_s = STRUCTURES[s]
        N_q_s = int(banks[s]["ents"].shape[0])
        N_h_s = (int(banks[s]["h_ents"].shape[0])
                 if "h_ents" in banks[s] else 0)
        use_hard = bool(args.train_hard_negs and N_h_s)

        def run(p, o, data, emode, mstart, start, n):
            def body(i, carry):
                p, o, _ = carry
                key = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 7), i)
                k_idx, k_neg = jax.random.split(key)
                idx = jax.random.randint(k_idx, (B,), 0, N_q_s)
                ne = data["ents"][idx]
                shared = None
                if args.train_shared_negs:
                    if args.train_shared_strat:
                        kk = args.train_shared_negs
                        u = jax.random.randint(
                            k_neg, (kk,), 0, 1 << 30)
                        sm = jnp.arange(kk) % cfg.n_modes
                        lo = mstart[sm]
                        width = mstart[sm + 1] - lo
                        shared = lo + u % width
                    else:
                        shared = jax.random.randint(
                            k_neg, (args.train_shared_negs,), 0,
                            cfg.n_entities)

                hargs = None
                if use_hard:
                    k_h = jax.random.fold_in(key, 2)
                    idx_h = jax.random.randint(k_h, (Bh,), 0, N_h_s)
                    hargs = (data["h_ents"][idx_h],
                             data["h_rels"][idx_h],
                             data["h_hard"][idx_h])

                def loss_fn(pp):
                    loss = multi_loss(pp, s, ne, emode[ne],
                                      data["rels"][idx],
                                      ne[:, spec_s.target_slot],
                                      data["negs"][idx],
                                      shared=shared)
                    if hargs is not None:
                        # sampled strict-subset hard negatives
                        # (SURVEY.md §A.4), -1-padded mask
                        hne, hre, hng = hargs
                        hpos, hns = pos_neg(
                            pp, s, hne, emode[hne],
                            hre, hne[:, spec_s.target_slot],
                            jnp.maximum(hng, 0))
                        m = (hng >= 0).astype(jnp.float32)
                        hm = args.hard_margin or cfg.margin
                        viol = jax.nn.relu(
                            hm - hpos[:, None] + hns) * m
                        # curriculum gate: 0 until hard_start of the
                        # full phase has run (i counts from 0)
                        gate = (i >= jnp.int32(
                            args.hard_start * args.steps)
                        ).astype(jnp.float32)
                        loss = loss + gate * args.hard_weight * (
                            jnp.sum(viol)
                            / jnp.maximum(jnp.sum(m), 1.0))
                    return loss

                l, g = jax.value_and_grad(loss_fn)(p)
                up, o = opt.update(g, o, p)
                return optax.apply_updates(p, up), o, l

            return jax.lax.fori_loop(start, start + n, body,
                                     (p, o, jnp.float32(0)))

        return jax.jit(run, static_argnums=(6,), donate_argnums=(0, 1))

    burn = make_chain_phase()

    def drive(fn, p, o, data, total, label):
        t0 = time.perf_counter()
        step = 0
        while step < total:
            n = min(args.steps_per_call, total - step)
            p, o, l = fn(p, o, data, entity_mode, mode_start, step, n)
            step += n
            print(json.dumps({"phase": label, "step": step,
                              "loss": float(l),
                              "seconds": time.perf_counter() - t0}),
                  flush=True)
        return p, o

    params, opt_state = drive(burn, params, opt_state, ebank,
                              args.burn_in_steps, "burn_in")

    # full phase: round-robin over structures, one steps_per_call
    # dispatch each (the reference curriculum trains a mixed stream
    # after burn-in, SURVEY.md §A.4; distinct query shapes compile to
    # distinct programs, so the mix granularity is the dispatch)
    fulls = {s: make_multi_phase(s) for s in structures}
    # weighted dispatch schedule: one round-robin cycle holds w_s
    # dispatches of structure s, interleaved (…a b a b a… rather than
    # …a a b b…) so no structure goes stale within a cycle
    weights = {s: 1 for s in structures}
    if args.structure_weights:
        for item in args.structure_weights.split(","):
            name, _, w = item.partition("=")
            name = name.strip()
            if name not in weights:
                raise SystemExit(
                    f"--structure_weights: {name!r} not in the trained "
                    f"structure set {sorted(weights)}")
            weights[name] = max(1, int(w))
        cyc = max(weights.values())
        # Bresenham spread: s appears exactly weights[s] times per cycle
        schedule = [s for i in range(cyc) for s in structures
                    if (i + 1) * weights[s] // cyc > i * weights[s] // cyc]
    else:
        schedule = list(structures)
    t0 = time.perf_counter()
    step, si = 0, 0
    while step < args.steps:
        s = schedule[si % len(schedule)]
        si += 1
        n = min(args.steps_per_call, args.steps - step)
        params, opt_state, l = fulls[s](
            params, opt_state, banks[s], entity_mode, mode_start, step, n)
        step += n
        print(json.dumps({"phase": "full", "structure": s, "step": step,
                          "loss": float(l),
                          "seconds": time.perf_counter() - t0}),
              flush=True)

    # ---- held-out eval ---------------------------------------------
    from mpqe_tpu.train.evaluation import roc_auc

    em_np = kg.entity_mode
    CH = 8192

    def eval_structure(s):
        spec_s = STRUCTURES[s]

        @jax.jit
        def eval_chunk(p, ne, nm, er, tgt, neg):
            return pos_neg(p, s, ne, nm, er, tgt, neg)

        v = va[s]
        n_v = v["entities"].shape[0]
        pad = (-n_v) % CH
        ve = np.pad(v["entities"], ((0, pad), (0, 0)))
        vr = np.pad(v["rels"], ((0, pad), (0, 0)))

        def score_rows(ents, rels, neg_idx):  # padded [n+pad, ...]
            n = ents.shape[0]
            npad = (-n) % CH
            e_ = np.pad(ents, ((0, npad), (0, 0)))
            r_ = np.pad(rels, ((0, npad), (0, 0)))
            g_ = np.pad(neg_idx, ((0, npad), (0, 0)))
            ps_a = np.zeros(n, np.float32)
            ns_a = np.zeros((n, neg_idx.shape[1]), np.float32)
            for lo in range(0, n, CH):
                ps, ns = eval_chunk(
                    params, jnp.asarray(e_[lo:lo + CH]),
                    jnp.asarray(em_np[e_[lo:lo + CH]]),
                    jnp.asarray(r_[lo:lo + CH]),
                    jnp.asarray(e_[lo:lo + CH, spec_s.target_slot]),
                    jnp.asarray(g_[lo:lo + CH]))
                hi = min(lo + CH, n)
                ps_a[lo:hi] = np.asarray(ps)[: hi - lo]
                ns_a[lo:hi] = np.asarray(ns)[: hi - lo]
            return ps_a, ns_a

        def score_against(neg_idx):  # [n_v+pad, K] entity ids
            ps_a = np.zeros(n_v, np.float32)
            ns_a = np.zeros((n_v, neg_idx.shape[1]), np.float32)
            for lo in range(0, n_v, CH):
                ps, ns = eval_chunk(
                    params, jnp.asarray(ve[lo:lo + CH]),
                    jnp.asarray(em_np[ve[lo:lo + CH]]),
                    jnp.asarray(vr[lo:lo + CH]),
                    jnp.asarray(ve[lo:lo + CH, spec_s.target_slot]),
                    jnp.asarray(neg_idx[lo:lo + CH]))
                hi = min(lo + CH, n_v)
                ps_a[lo:hi] = np.asarray(ps)[: hi - lo]
                ns_a[lo:hi] = np.asarray(ns)[: hi - lo]
            return ps_a, ns_a

        vn = np.pad(v["negatives"], ((0, pad), (0, 0)))
        pos_all, neg_all = score_against(vn)
        mask = np.ones_like(neg_all, np.float32)
        res = {"apr": float(np.mean(
                   _apr_percentiles(pos_all, neg_all, mask))),
               # per-query AUC against own negatives == APR/100; pooled
               # Mann-Whitney kept for continuity with small-scale tables
               "auc_pooled": float(roc_auc(pos_all, neg_all)),
               "val_heldout": int(n_v)}
        if args.eval_oracle:
            # exact answer sets from the KG closure: (a) APR ceiling
            # under THESE sampled negatives — an ideal model ties
            # negatives that are true answers (0.5 credit each);
            # (b) hard negatives by the reference strict-subset
            # convention, scored with the trained model (hard APR
            # ceiling is ~100 by construction)
            t0 = time.perf_counter()
            orng = np.random.default_rng(args.seed + 11)
            ve_i, vr_i, vn_i = v["entities"], v["rels"], v["negatives"]
            ceil_pcts = np.zeros(n_v, np.float64)
            hard = np.full((n_v, args.n_hard_eval), -1, np.int32)
            n_ans = np.zeros(n_v, np.int64)
            for i in range(n_v):
                A = oracle.answers(spec_s, ve_i[i], vr_i[i])
                n_ans[i] = A.size
                c = float(np.isin(vn_i[i], A).sum())
                n = vn_i.shape[1]
                ceil_pcts[i] = 100.0 * (1.0 - 0.5 * c / n)
                hard[i] = oracle.hard_negatives(
                    spec_s, ve_i[i], vr_i[i], args.n_hard_eval, orng)
            res["apr_ceiling"] = float(np.mean(ceil_pcts))
            res["mean_answer_set"] = float(np.mean(n_ans))
            res["apr_vs_ceiling"] = res["apr"] / res["apr_ceiling"]

            hp = np.pad(hard, ((0, pad), (0, 0)))
            hpos, hneg = score_against(np.where(hp < 0, 0, hp))
            hmask = (hard >= 0).astype(np.float32)
            hpct = _apr_percentiles(hpos, hneg, hmask)
            res["hard_apr"] = (float(np.mean(hpct)) if hpct.size
                               else None)
            res["hard_queries"] = int((hmask.sum(axis=1) > 0).sum())
            res["oracle_seconds"] = time.perf_counter() - t0
        if args.eval_train_hard and s in hard_np:
            hb = hard_np[s]
            n_t = min(16384, hb["ents"].shape[0])
            te, trr = hb["ents"][:n_t], hb["rels"][:n_t]
            th = hb["hard"][:n_t]
            tps, tns = score_rows(te, trr, np.where(th < 0, 0, th))
            tmask = (th >= 0).astype(np.float32)
            tpct = _apr_percentiles(tps, tns, tmask)
            res["train_hard_apr"] = (float(np.mean(tpct)) if tpct.size
                                     else None)
            res["train_hard_queries"] = int((tmask.sum(axis=1) > 0).sum())
        return res

    per_struct = {s: eval_structure(s) for s in structures}

    result = {
        "phase": "result", "model": args.model,
        "structure": args.structure, "kg": args.kg,
        "entities": kg.n_entities, "directed_edges": int(2 * kg.n_triples),
        "train_queries": sum(int(tr[s]["entities"].shape[0])
                             for s in structures),
        "steps": args.steps, "burn_in_steps": args.burn_in_steps,
        "batch": B,
        "backend": __import__("jax").default_backend(),
    }
    if len(structures) == 1:
        result.update(per_struct[structures[0]])
    else:
        # macro averages over structures (the reference's summary
        # convention); per-structure detail alongside
        def macro(key):
            vals = [per_struct[s][key] for s in structures
                    if per_struct[s].get(key) is not None]
            return float(np.mean(vals)) if vals else None
        result["apr"] = macro("apr")
        result["auc_pooled"] = macro("auc_pooled")
        result["val_heldout"] = sum(per_struct[s]["val_heldout"]
                                    for s in structures)
        if args.eval_oracle:
            result["apr_ceiling"] = macro("apr_ceiling")
            result["apr_vs_ceiling"] = macro("apr_vs_ceiling")
            result["hard_apr"] = macro("hard_apr")
            result["hard_queries"] = sum(
                per_struct[s].get("hard_queries", 0) or 0
                for s in structures)
        result["per_structure"] = per_struct
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
