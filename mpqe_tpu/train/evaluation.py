"""Evaluation: per-structure ROC-AUC and APR (average percentile rank).

Reference: mpqe/utils.py ``eval_auc_queries`` / ``eval_perc_queries``
(SURVEY.md §3.4, §A.4):

  * AUC per formula: scores of true answers vs. each query's stored
    negative samples, macro-averaged per query structure; hard-negative
    AUC reported separately for intersection structures.
  * APR: per query, the percentile rank of the true answer's score among
    its negative candidates, averaged.

The reference leans on sklearn.metrics.roc_auc_score; sklearn is not a
dependency here, so ROC-AUC is computed exactly via the Mann-Whitney U
statistic (rank formulation with tie correction) — verified against a
brute-force pairwise count in tests.

Scoring sweeps are batched per formula through the dense encoder — each
(structure, bucket) compiles once; the candidate scoring itself is one
batched gather + cosine (MXU) per batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.data.batcher import (
    bucket_size, make_dense_batch, template_edge_norm,
)
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import INTERSECTION_STRUCTURES, STRUCTURES, Formula, Query


@functools.lru_cache(maxsize=None)
def _default_encode_fn():
    """Module-cached jitted MPQE dense encoder.

    evaluate()/full_ranking() are called every validation round; a fresh
    ``jax.jit`` wrapper per call would recompile every (structure, bucket)
    executable each round — minutes per compile on remote-relay TPU
    backends — so the default encoder is built exactly once per process.
    """
    return jax.jit(mpqe_mod.encode_dense, static_argnums=(1, 2))


def roc_auc(pos: np.ndarray, neg: np.ndarray) -> float:
    """Exact ROC-AUC of pos-vs-neg score samples (Mann-Whitney U / ranks,
    average ties) — equivalent to sklearn.roc_auc_score on the pooled
    scores with 1/0 labels."""
    pos = np.asarray(pos, dtype=np.float64).ravel()
    neg = np.asarray(neg, dtype=np.float64).ravel()
    if pos.size == 0 or neg.size == 0:
        return float("nan")
    scores = np.concatenate([pos, neg])
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, scores.size + 1, dtype=np.float64)
    # average ranks over ties
    sorted_scores = scores[order]
    i = 0
    while i < sorted_scores.size:
        j = i
        while j + 1 < sorted_scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            avg = 0.5 * (i + 1 + j + 1)
            ranks[order[i : j + 1]] = avg
        i = j + 1
    u = ranks[: pos.size].sum() - pos.size * (pos.size + 1) / 2.0
    return float(u / (pos.size * neg.size))


@dataclasses.dataclass
class EvalResult:
    auc_by_structure: Dict[str, float]
    apr_by_structure: Dict[str, float]
    hard_auc_by_structure: Dict[str, float]

    @property
    def macro_auc(self) -> float:
        vals = [v for v in self.auc_by_structure.values() if np.isfinite(v)]
        return float(np.mean(vals)) if vals else float("nan")

    @property
    def macro_apr(self) -> float:
        vals = [v for v in self.apr_by_structure.values() if np.isfinite(v)]
        return float(np.mean(vals)) if vals else float("nan")

    def flat(self) -> Dict[str, float]:
        out = {"auc_macro": self.macro_auc, "apr_macro": self.macro_apr}
        for k, v in self.auc_by_structure.items():
            out[f"auc/{k}"] = v
        for k, v in self.apr_by_structure.items():
            out[f"apr/{k}"] = v
        for k, v in self.hard_auc_by_structure.items():
            out[f"auc_hard/{k}"] = v
        return out


def _encode_and_score(
    params,
    cfg: mpqe_mod.MPQEConfig,
    formula: Formula,
    queries: Sequence[Query],
    n_neg: int,
    use_hard: bool,
    encode_fn,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (pos_scores [n_q], neg_scores [n_q, K], neg_mask)."""
    B = bucket_size(len(queries))
    b = make_dense_batch(
        formula, queries, batch_size=B, n_neg=n_neg,
        use_hard_negatives=use_hard,
        rng=np.random.default_rng(0),
    )
    q = encode_fn(
        params, cfg, b.structure,
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
    )
    ent = params["emb"]["ent"]
    pos = mpqe_mod.score(cfg, q, ent[jnp.asarray(b.target)])
    neg = mpqe_mod.score(
        cfg, q[:, None, :], ent[jnp.asarray(b.negatives)]
    )
    n_q = b.n_queries
    return (
        np.asarray(pos)[:n_q],
        np.asarray(neg)[:n_q],
        np.asarray(b.neg_mask)[:n_q],
    )


# ----------------------------------------------------------------------
# Batched eval: all formulas of a structure in ONE device sweep
# ----------------------------------------------------------------------
@dataclasses.dataclass
class EvalSet:
    """Pre-flattened eval queries, concatenated across formulas.

    The per-formula dispatch loop (reference protocol; SURVEY.md §3.4)
    was the eval bottleneck: hundreds of small padded device calls per
    validation round.  An EvalSet holds, per structure, one set of
    arrays over ALL its formulas' queries — the per-query relation ids
    make them encodable in a single call (``encode_dense_multi``).
    Built once; reused every validation round.
    """

    by_structure: Dict[str, Dict[str, np.ndarray]]


def make_eval_set(
    queries_by_structure: Dict[str, Dict[Formula, List[Query]]],
    max_queries_per_formula: Optional[int] = 1000,
    require_negatives: bool = True,
) -> EvalSet:
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for structure, by_formula in queries_by_structure.items():
        spec = STRUCTURES[structure]
        ne_l, nm_l, er_l, en_l = [], [], [], []
        tgt_l, fid_l = [], []
        neg_lists, hard_lists = [], []
        n_formulas = 0
        for formula, qs in by_formula.items():
            if max_queries_per_formula:
                qs = qs[:max_queries_per_formula]
            if require_negatives:  # full_ranking needs no sampled negs
                qs = [q for q in qs if q.neg_samples]
            if not qs:
                continue
            fid = n_formulas
            n_formulas += 1
            en = template_edge_norm(spec, formula.rels)
            for q in qs:
                ne = np.zeros((spec.n_nodes,), np.int32)
                for a_i, s in enumerate(spec.anchor_slots):
                    ne[s] = q.anchors[a_i]
                ne_l.append(ne)
                nm_l.append(np.asarray(formula.node_modes, np.int32))
                er_l.append(np.asarray(formula.rels, np.int32))
                en_l.append(en)
                tgt_l.append(q.target)
                fid_l.append(fid)
                neg_lists.append(np.asarray(q.neg_samples, np.int32))
                hard_lists.append(
                    np.asarray(q.hard_neg_samples, np.int32))
        if not tgt_l:
            continue
        neg_ptr = np.zeros(len(neg_lists) + 1, np.int64)
        np.cumsum([len(x) for x in neg_lists], out=neg_ptr[1:])
        hard_ptr = np.zeros(len(hard_lists) + 1, np.int64)
        np.cumsum([len(x) for x in hard_lists], out=hard_ptr[1:])
        out[structure] = dict(
            node_entity=np.stack(ne_l),
            node_mode=np.stack(nm_l),
            edge_rel=np.stack(er_l),
            edge_norm=np.stack(en_l),
            target=np.asarray(tgt_l, np.int32),
            formula_id=np.asarray(fid_l, np.int32),
            neg_pool=(np.concatenate(neg_lists) if neg_ptr[-1]
                      else np.zeros(0, np.int32)),
            neg_ptr=neg_ptr,
            hard_pool=(np.concatenate(hard_lists) if hard_ptr[-1]
                       else np.zeros(0, np.int32)),
            hard_ptr=hard_ptr,
            n_formulas=np.int32(n_formulas),
        )
    return EvalSet(by_structure=out)


def _pad_chunk(a: np.ndarray, lo: int, hi: int, B: int, fill=0) -> jax.Array:
    """Rows [lo, hi) of ``a`` padded to bucket size ``B`` with ``fill``."""
    padded = np.full((B,) + a.shape[1:], fill, a.dtype)
    padded[: hi - lo] = a[lo:hi]
    return jnp.asarray(padded)


def _effective_max_batch(cfg, max_batch: int, per_row_elems: int) -> int:
    """Cap the sweep chunk so per-dispatch intermediates stay bounded.

    ``per_row_elems`` = device elements materialized per batch row (e.g.
    ``n_entities`` for a full score matrix, ``d*do`` per gathered
    full-weight relation matrix).  Budget: ~2^28 fp32 elements (1 GiB)
    per intermediate."""
    cap = max(256, (1 << 28) // max(per_row_elems, 1))
    return min(max_batch, cap)


def _sample_csr(pool, ptr, n_neg, rng):
    """[Nq, n_neg] samples (with replacement) + mask from CSR pools."""
    cnt = np.diff(ptr)
    n_q = cnt.shape[0]
    safe = np.maximum(cnt, 1)
    r = rng.integers(0, 1 << 62, (n_q, n_neg)) % safe[:, None]
    idx = ptr[:-1, None] + r
    neg = pool[np.minimum(idx, max(pool.shape[0] - 1, 0))].astype(np.int32)
    mask = (cnt > 0).astype(np.float32)[:, None] * np.ones(
        (1, n_neg), np.float32)
    return neg, mask


@functools.lru_cache(maxsize=None)
def _multi_encode_fn():
    # _auto: fused Pallas multi kernel on TPU when the model qualifies
    return jax.jit(mpqe_mod.encode_dense_multi_auto, static_argnums=(1, 2))


@functools.lru_cache(maxsize=None)
def _score_batch_fn():
    def f(params, cfg, structure, ne, nm, er, en, tgt, neg, nbr=None):
        if not isinstance(cfg, mpqe_mod.MPQEConfig):  # GQE baselines
            from mpqe_tpu.models import gqe as gqe_mod

            return gqe_mod.score_pos_neg(
                params, cfg, structure, ne, er, tgt, neg,
                neighbor_table=nbr)
        q = mpqe_mod.encode_dense_multi_auto(
            params, cfg, structure, ne, nm, er, en)
        ent = params["emb"]["ent"]
        pos_s = mpqe_mod.score(cfg, q, ent[tgt])
        neg_s = mpqe_mod.score(cfg, q[:, None, :], ent[neg])
        return pos_s, neg_s

    return jax.jit(f, static_argnums=(1, 2))


def _apr_percentiles(pos, neg, mask):
    """Vectorized per-query percentile of pos among its masked negatives."""
    m = mask > 0
    cnt = m.sum(axis=1)
    below = ((neg < pos[:, None]) & m).sum(axis=1) + 0.5 * (
        (neg == pos[:, None]) & m
    ).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        perc = 100.0 * below / cnt
    return perc[cnt > 0]


def evaluate_batched(
    params,
    cfg,  # MPQEConfig or GQEConfig (dispatched inside _score_batch_fn)
    eval_set: EvalSet,
    n_neg: int = 64,
    max_batch: int = 8192,
    seed: int = 0,
    neighbor_table=None,
) -> EvalResult:
    """One encode+score sweep per structure (chunked at ``max_batch``),
    metrics reduced with vectorized numpy — no per-formula dispatches, no
    per-query Python.  Same protocol as :func:`evaluate`.  Covers both
    MPQE layer kinds and the GQE baselines (incl. SoftAnd conjunct-min
    scoring) via per-query-relation encoders.  ``neighbor_table`` (jnp
    ``{"idx", "mask"}``) activates the GQE neighborhood anchor encoder
    (GQEConfig.encoder="neighborhood") — train and eval must agree."""
    auc_s: Dict[str, float] = {}
    apr_s: Dict[str, float] = {}
    hard_s: Dict[str, float] = {}
    score_fn = _score_batch_fn()
    rng = np.random.default_rng(seed)
    if isinstance(cfg, mpqe_mod.MPQEConfig) and cfg.num_bases is None:
        # full-weight models gather [B, d, do] per edge slot
        max_batch = _effective_max_batch(
            cfg, max_batch, cfg.embed_dim * cfg.embed_dim)
    for structure, data in eval_set.by_structure.items():
        n_q = data["target"].shape[0]
        negs, mask = _sample_csr(
            data["neg_pool"], data["neg_ptr"], n_neg, rng)
        pos_all = np.zeros(n_q, np.float32)
        neg_all = np.zeros((n_q, n_neg), np.float32)
        for lo in range(0, n_q, max_batch):
            hi = min(lo + max_batch, n_q)
            B = bucket_size(hi - lo)
            p_s, n_s = score_fn(
                params, cfg, structure,
                _pad_chunk(data["node_entity"], lo, hi, B),
                _pad_chunk(data["node_mode"], lo, hi, B),
                _pad_chunk(data["edge_rel"], lo, hi, B),
                _pad_chunk(data["edge_norm"], lo, hi, B, 1),
                _pad_chunk(data["target"], lo, hi, B),
                _pad_chunk(negs, lo, hi, B),
                neighbor_table,
            )
            pos_all[lo:hi] = np.asarray(p_s)[: hi - lo]
            neg_all[lo:hi] = np.asarray(n_s)[: hi - lo]

        # per-formula AUC, macro-averaged (reference protocol)
        fid = data["formula_id"]
        f_aucs = []
        for f in range(int(data["n_formulas"])):
            sel = fid == f
            msel = mask[sel] > 0
            a = roc_auc(pos_all[sel][msel.any(axis=1)], neg_all[sel][msel])
            if np.isfinite(a):
                f_aucs.append(a)
        if f_aucs:
            auc_s[structure] = float(np.mean(f_aucs))
        perc = _apr_percentiles(pos_all, neg_all, mask)
        if perc.size:
            apr_s[structure] = float(np.mean(perc))

        if structure in INTERSECTION_STRUCTURES and data["hard_ptr"][-1]:
            has_hard = np.diff(data["hard_ptr"]) > 0
            hneg, hmask = _sample_csr(
                data["hard_pool"], data["hard_ptr"], n_neg, rng)
            hmask = hmask * has_hard[:, None]
            f_hard = []
            # hard negatives share the query vectors: one more scoring
            # sweep with the hard pools (queries without hard negs are
            # masked out)
            hneg_s = np.zeros((n_q, n_neg), np.float32)
            for lo in range(0, n_q, max_batch):
                hi = min(lo + max_batch, n_q)
                B = bucket_size(hi - lo)
                _, n_s = score_fn(
                    params, cfg, structure,
                    _pad_chunk(data["node_entity"], lo, hi, B),
                    _pad_chunk(data["node_mode"], lo, hi, B),
                    _pad_chunk(data["edge_rel"], lo, hi, B),
                    _pad_chunk(data["edge_norm"], lo, hi, B, 1),
                    _pad_chunk(data["target"], lo, hi, B),
                    _pad_chunk(hneg, lo, hi, B),
                    neighbor_table,
                )
                hneg_s[lo:hi] = np.asarray(n_s)[: hi - lo]
            for f in range(int(data["n_formulas"])):
                sel = (fid == f) & has_hard
                if not sel.any():
                    continue
                msel = hmask[sel] > 0
                a = roc_auc(
                    pos_all[sel][msel.any(axis=1)], hneg_s[sel][msel])
                if np.isfinite(a):
                    f_hard.append(a)
            if f_hard:
                hard_s[structure] = float(np.mean(f_hard))
    return EvalResult(auc_s, apr_s, hard_s)


def evaluate(
    params,
    cfg: mpqe_mod.MPQEConfig,
    queries_by_structure: Dict[str, Dict[Formula, List[Query]]],
    n_neg: int = 64,
    max_queries_per_formula: Optional[int] = 1000,
    encode_fn=None,
) -> EvalResult:
    """AUC + APR per structure (macro over formulas), hard-AUC for
    intersections — the reference's eval protocol (SURVEY.md §3.4)."""
    if encode_fn is None:
        encode_fn = _default_encode_fn()
    auc_s: Dict[str, float] = {}
    apr_s: Dict[str, float] = {}
    hard_s: Dict[str, float] = {}
    for structure, by_formula in queries_by_structure.items():
        f_aucs: List[float] = []
        f_hard: List[float] = []
        percentiles: List[float] = []
        for formula, qs in by_formula.items():
            if max_queries_per_formula:
                qs = qs[:max_queries_per_formula]
            qs = [q for q in qs if q.neg_samples]
            if not qs:
                continue
            pos, neg, mask = _encode_and_score(
                params, cfg, formula, qs, n_neg, False, encode_fn
            )
            valid = mask > 0
            a = roc_auc(pos[valid.any(axis=1)], neg[valid])
            if np.isfinite(a):
                f_aucs.append(a)
            # APR: per query, fraction of its negatives scored below pos
            for i in range(len(pos)):
                m = valid[i]
                if m.sum() == 0:
                    continue
                below = (neg[i][m] < pos[i]).sum() + 0.5 * (
                    neg[i][m] == pos[i]
                ).sum()
                percentiles.append(100.0 * below / m.sum())
            if structure in INTERSECTION_STRUCTURES:
                qs_h = [q for q in qs if q.hard_neg_samples]
                if qs_h:
                    pos_h, neg_h, mask_h = _encode_and_score(
                        params, cfg, formula, qs_h, n_neg, True, encode_fn
                    )
                    vh = mask_h > 0
                    ah = roc_auc(pos_h[vh.any(axis=1)], neg_h[vh])
                    if np.isfinite(ah):
                        f_hard.append(ah)
        if f_aucs:
            auc_s[structure] = float(np.mean(f_aucs))
        if percentiles:
            apr_s[structure] = float(np.mean(percentiles))
        if f_hard:
            hard_s[structure] = float(np.mean(f_hard))
    return EvalResult(auc_s, apr_s, hard_s)


def _rank_all_impl(params, cfg, structure, ne, nm, er, en, nbr=None):
    """[B, n_entities] scoring sweep; dispatches per config type like
    _score_batch_fn (SoftAnd GQE ranks by conjunct-min scores)."""
    if isinstance(cfg, mpqe_mod.MPQEConfig):
        q = mpqe_mod.encode_dense_multi_auto(
            params, cfg, structure, ne, nm, er, en)
        return mpqe_mod.score_all_entities(params, cfg, q)
    from mpqe_tpu.models import gqe as gqe_mod

    m_cfg = gqe_mod._score_cfg(cfg)
    if cfg.decoder == "bibox":
        branches = gqe_mod.branch_vectors(
            params, cfg, structure, ne, er, nbr)
        if cfg.soft_and:
            return jnp.min(jnp.stack(
                [gqe_mod.bibox_score_all(params, cfg, b)
                 for b in branches], 0), axis=0)
        return gqe_mod.bibox_score_all(
            params, cfg, gqe_mod._intersect_bibox(cfg, params, branches))
    if cfg.decoder == "box":
        branches = gqe_mod.branch_vectors(
            params, cfg, structure, ne, er, nbr)
        if cfg.soft_and:
            return jnp.min(jnp.stack(
                [gqe_mod.box_score_all(params, cfg, b)
                 for b in branches], 0), axis=0)
        return gqe_mod.box_score_all(
            params, cfg, gqe_mod._intersect_box(cfg, params, branches))
    if cfg.soft_and:
        branches = gqe_mod.branch_vectors(
            params, cfg, structure, ne, er, nbr)
        return jnp.min(jnp.stack(
            [mpqe_mod.score_all_entities(params, m_cfg, b)
             for b in branches], 0), axis=0)
    q = gqe_mod.encode_dense_multi(
        params, cfg, structure, ne, nm, er, en, nbr)
    return mpqe_mod.score_all_entities(params, m_cfg, q)


@functools.lru_cache(maxsize=None)
def _rank_all_fn():
    """Jitted [B, n_entities] scoring sweep (see _rank_all_impl)."""
    return jax.jit(_rank_all_impl, static_argnums=(1, 2))


def _rank_counts_impl(params, cfg, structure, ne, nm, er, en, target,
                      emode, nbr=None):
    """Device-side rank: encode + score sweep + same-mode count above
    the true answer — only a ``[B]`` int vector leaves the device (the
    score matrix itself is 4 GB at B=1024 / 1M entities; shipping it to
    the host dominated eval wall time on the relay backend).  Semantics
    identical to the numpy formulation it replaced:
    rank = 1 + #(same-mode candidates scoring strictly above)."""
    scores = _rank_all_impl(params, cfg, structure, ne, nm, er, en, nbr)
    t_mode = emode[target]
    mode_ok = emode[None, :] == t_mode[:, None]
    true_s = jnp.take_along_axis(scores, target[:, None], axis=1)[:, 0]
    above = (scores > true_s[:, None]) & mode_ok
    return 1 + jnp.sum(above, axis=1)


@functools.lru_cache(maxsize=None)
def _rank_counts_fn():
    """Jitted :func:`_rank_counts_impl` (tools/eval_bench.py times the
    same impl inside its fori_loop sweep)."""
    return jax.jit(_rank_counts_impl, static_argnums=(1, 2))


def full_ranking(
    params,
    cfg,  # MPQEConfig or GQEConfig
    queries_by_structure: Dict[str, Dict[Formula, List[Query]]],
    entity_mode: np.ndarray,
    hits_at: Tuple[int, ...] = (1, 3, 10),
    max_queries_per_formula: Optional[int] = 200,
    max_batch: int = 8192,
    neighbor_table=None,
) -> Dict[str, Dict[str, float]]:
    """Full-candidate ranking metrics (MRR / Hits@K) per structure.

    Goes beyond the reference's sampled-negative APR: scores every
    entity via one ``[B, n_entities]`` MXU matmul per chunk and ranks
    the true answer among candidates of the target's mode.  Unfiltered
    (other true answers count as competitors), like raw KG-completion
    ranking.  Batched like :func:`evaluate_batched`: all formulas of a
    structure sweep in one dispatch per ``max_batch`` chunk."""
    entity_mode = np.asarray(entity_mode)
    es = make_eval_set(queries_by_structure, max_queries_per_formula,
                       require_negatives=False)
    fn = _rank_counts_fn()
    emode_dev = jnp.asarray(entity_mode.astype(np.int32))
    # each chunk materializes a [B, n_entities] score matrix on device;
    # only the [B] rank vector comes back (the matrix itself is 4 GB at
    # B=1024 / 1M entities — shipping it to the host dominated eval wall
    # time, especially over the relay)
    max_batch = _effective_max_batch(cfg, max_batch, cfg.n_entities)
    out: Dict[str, Dict[str, float]] = {}
    for structure, data in es.by_structure.items():
        n_q = data["target"].shape[0]
        ranks = np.zeros(n_q, np.float64)
        for lo in range(0, n_q, max_batch):
            hi = min(lo + max_batch, n_q)
            B = bucket_size(hi - lo)
            r = np.asarray(fn(
                params, cfg, structure,
                _pad_chunk(data["node_entity"], lo, hi, B),
                _pad_chunk(data["node_mode"], lo, hi, B),
                _pad_chunk(data["edge_rel"], lo, hi, B),
                _pad_chunk(data["edge_norm"], lo, hi, B, 1),
                _pad_chunk(data["target"][:, None], lo, hi, B)[:, 0],
                emode_dev,
                neighbor_table,
            ))
            ranks[lo:hi] = r[: hi - lo]
        if n_q:
            out[structure] = _rank_metrics(ranks, hits_at)
    return out


def _rank_metrics(ranks: np.ndarray, hits_at: Tuple[int, ...]
                  ) -> Dict[str, float]:
    m: Dict[str, float] = {
        "mrr": float(np.mean(1.0 / ranks)),
        "mean_rank": float(ranks.mean()),
    }
    for k in hits_at:
        m[f"hits@{k}"] = float(np.mean(ranks <= k))
    return m


def full_ranking_sharded(
    params,
    cfg,  # MPQEConfig only
    queries_by_structure: Dict[str, Dict[Formula, List[Query]]],
    entity_mode: np.ndarray,
    mesh,
    hits_at: Tuple[int, ...] = (1, 3, 10),
    max_queries_per_formula: Optional[int] = 200,
    max_batch: int = 8192,
) -> Dict[str, Dict[str, float]]:
    """:func:`full_ranking` over a row-sharded entity table.

    For tables that exceed one chip (config-5 / 10M-entity regime):
    encode gathers anchor rows from the model-axis-sharded table via
    GSPMD, and the rank count runs per shard + ``psum``
    (``parallel/rank_shard``) — no ``[B, n_entities]`` score matrix
    exists on any device.  Identical rank semantics to
    :func:`full_ranking` (pinned element-exact in
    ``tests/test_serve_sharded.py`` / ``test_evaluation.py``)."""
    from mpqe_tpu.parallel import mesh as mesh_lib
    from mpqe_tpu.parallel import rank_shard

    if not isinstance(cfg, mpqe_mod.MPQEConfig):
        raise ValueError("sharded full ranking supports MPQE configs only")
    entity_mode = np.asarray(entity_mode)
    es = make_eval_set(queries_by_structure, max_queries_per_formula,
                       require_negatives=False)
    p_sh = rank_shard.shard_encode_params(dict(params), mesh)
    # ranking reuses the encode table buffer (no second row-sharded f32
    # copy — it would double per-device HBM at exactly the scale that
    # motivates sharding); only the padded mode vector is new
    ent_s = p_sh["emb"]["ent"]
    mode_s = rank_shard.shard_modes(
        mesh, jnp.asarray(entity_mode.astype(np.int32)), ent_s.shape[0])
    rank_fn = rank_shard.make_sharded_rank_fn(mesh, cfg)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fn(p, ent_sh, mode_sh, structure, ne, nm, er, en, target):
        q = mpqe_mod.encode_dense_multi_auto(
            p, cfg, structure, ne, nm, er, en)
        return rank_fn(ent_sh, mode_sh, q.astype(jnp.float32), target)

    n_shards = mesh.shape[mesh_lib.model_axis(mesh)]
    max_batch = _effective_max_batch(
        cfg, max_batch, max(cfg.n_entities // n_shards, 1))
    out: Dict[str, Dict[str, float]] = {}
    for structure, data in es.by_structure.items():
        n_q = data["target"].shape[0]
        ranks = np.zeros(n_q, np.float64)
        for lo in range(0, n_q, max_batch):
            hi = min(lo + max_batch, n_q)
            B = bucket_size(hi - lo)
            r = np.asarray(fn(
                p_sh, ent_s, mode_s, structure,
                _pad_chunk(data["node_entity"], lo, hi, B),
                _pad_chunk(data["node_mode"], lo, hi, B),
                _pad_chunk(data["edge_rel"], lo, hi, B),
                _pad_chunk(data["edge_norm"], lo, hi, B, 1),
                _pad_chunk(data["target"][:, None], lo, hi, B)[:, 0],
            ))
            ranks[lo:hi] = r[: hi - lo]
        if n_q:
            out[structure] = _rank_metrics(ranks, hits_at)
    return out
