"""AUC (vs brute-force pairwise), APR, and the evaluate() sweep."""

import numpy as np
import jax

from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import group_queries_by_formula
from mpqe_tpu.train import evaluation


def brute_auc(pos, neg):
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_roc_auc_matches_bruteforce(rng):
    for _ in range(10):
        pos = rng.normal(size=rng.integers(2, 30))
        neg = rng.normal(size=rng.integers(2, 30))
        np.testing.assert_allclose(
            evaluation.roc_auc(pos, neg), brute_auc(pos, neg), rtol=1e-9
        )


def test_roc_auc_with_ties():
    pos = np.array([1.0, 1.0, 2.0])
    neg = np.array([1.0, 0.0])
    np.testing.assert_allclose(
        evaluation.roc_auc(pos, neg), brute_auc(pos, neg), rtol=1e-9
    )


def test_roc_auc_extremes():
    assert evaluation.roc_auc([2.0, 3.0], [0.0, 1.0]) == 1.0
    assert evaluation.roc_auc([0.0], [1.0, 2.0]) == 0.0
    assert np.isnan(evaluation.roc_auc([], [1.0]))


def test_evaluate_end_to_end():
    kg = make_random_kg(n_entities=100, n_modes=2, n_base_rels=3,
                        n_triples=800, seed=5)
    sampler = QuerySampler(kg, seed=2)
    qs = (sampler.sample_queries("1-chain", 30, n_neg=16)
          + sampler.sample_queries("2-inter", 20, n_neg=16, n_hard_neg=16))
    grouped = group_queries_by_formula(qs)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=2, readout="sum",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    res = evaluation.evaluate(params, cfg, grouped, n_neg=16)
    assert "1-chain" in res.auc_by_structure
    assert "2-inter" in res.auc_by_structure
    for v in res.auc_by_structure.values():
        assert 0.0 <= v <= 1.0
    for v in res.apr_by_structure.values():
        assert 0.0 <= v <= 100.0
    flat = res.flat()
    assert "auc_macro" in flat and np.isfinite(flat["auc_macro"])
    # random model ~ chance level
    assert 0.2 <= res.macro_auc <= 0.8


def test_full_ranking_metrics():
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
    kg = make_random_kg(n_entities=80, n_modes=2, n_base_rels=3,
                        n_triples=300, seed=61)
    sampler = QuerySampler(kg, seed=3)
    qs = sampler.sample_queries("1-chain", 20, n_neg=4)
    grouped = group_queries_by_formula(qs)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=1, readout="sum")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    m = evaluation.full_ranking(params, cfg, grouped, kg.entity_mode)
    assert "1-chain" in m
    s = m["1-chain"]
    assert 0 <= s["mrr"] <= 1
    assert s["hits@1"] <= s["hits@3"] <= s["hits@10"]
    assert s["mean_rank"] >= 1
