"""AUC (vs brute-force pairwise), APR, and the evaluate() sweep."""

import numpy as np
import jax
import pytest

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


@pytest.mark.parametrize("num_bases", [3, None])
def test_encode_dense_multi_matches_per_formula(num_bases):
    """Per-query-relation batched encoder == encode_dense per formula on
    the concatenation of several formulas of one structure (exact).
    Covers both layer kinds: basis-decomposed (basis-first contraction)
    and full-weight (per-query w_rel gather)."""
    import jax.numpy as jnp
    from mpqe_tpu.data.batcher import make_dense_batch

    kg = make_random_kg(n_entities=120, n_modes=3, n_base_rels=4,
                        n_triples=900, seed=9)
    sampler = QuerySampler(kg, seed=7)
    qs = sampler.sample_queries("3-chain_inter", 40, n_neg=4)
    grouped = group_queries_by_formula(qs)["3-chain_inter"]
    assert len(grouped) >= 2, "need several formulas for the test"
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=num_bases, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(1), cfg)

    es = evaluation.make_eval_set({"3-chain_inter": grouped})
    data = es.by_structure["3-chain_inter"]
    got = np.asarray(mpqe_mod.encode_dense_multi(
        params, cfg, "3-chain_inter",
        jnp.asarray(data["node_entity"]), jnp.asarray(data["node_mode"]),
        jnp.asarray(data["edge_rel"]), jnp.asarray(data["edge_norm"]),
    ))

    # per-formula oracle in the same (formula-major) order
    rows = []
    for formula, fqs in grouped.items():
        fqs = [q for q in fqs if q.neg_samples]
        if not fqs:
            continue
        b = make_dense_batch(formula, fqs, batch_size=len(fqs), n_neg=1)
        q = np.asarray(mpqe_mod.encode_dense(
            params, cfg, "3-chain_inter",
            jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
            jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        ))
        rows.append(q[: b.n_queries])
    want = np.concatenate(rows)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_evaluate_batched_matches_per_formula_eval():
    """evaluate_batched ~= evaluate on the same queries (sampling of
    negatives differs, so compare with full pools: n_neg >= pool size and
    the AUC over sampled-with-replacement negatives stays close)."""
    kg = make_random_kg(n_entities=100, n_modes=2, n_base_rels=3,
                        n_triples=800, seed=5)
    sampler = QuerySampler(kg, seed=2)
    qs = (sampler.sample_queries("1-chain", 40, n_neg=16)
          + sampler.sample_queries("2-inter", 30, n_neg=16, n_hard_neg=16))
    grouped = group_queries_by_formula(qs)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=2, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    res_old = evaluation.evaluate(params, cfg, grouped, n_neg=64)
    es = evaluation.make_eval_set(grouped)
    res_new = evaluation.evaluate_batched(params, cfg, es, n_neg=64)
    assert set(res_new.auc_by_structure) == set(res_old.auc_by_structure)
    for s in res_old.auc_by_structure:
        assert abs(res_new.auc_by_structure[s]
                   - res_old.auc_by_structure[s]) < 0.08, s
        assert abs(res_new.apr_by_structure[s]
                   - res_old.apr_by_structure[s]) < 8.0, s
    assert set(res_new.hard_auc_by_structure) == set(
        res_old.hard_auc_by_structure)


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


@pytest.mark.parametrize("soft_and", [False, True])
def test_full_ranking_gqe(soft_and):
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
    from mpqe_tpu.models import gqe as gqe_mod
    kg = make_random_kg(n_entities=80, n_modes=2, n_base_rels=3,
                        n_triples=300, seed=62)
    sampler = QuerySampler(kg, seed=4)
    qs = (sampler.sample_queries("2-chain", 15, n_neg=4)
          + sampler.sample_queries("2-inter", 15, n_neg=4))
    grouped = group_queries_by_formula(qs)
    cfg = gqe_mod.GQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, decoder="bilinear", intersection="min",
        soft_and=soft_and)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(1), cfg)
    m = evaluation.full_ranking(params, cfg, grouped, kg.entity_mode)
    for s in ("2-chain", "2-inter"):
        assert 0 <= m[s]["mrr"] <= 1
        assert m[s]["hits@1"] <= m[s]["hits@3"] <= m[s]["hits@10"]
        assert m[s]["mean_rank"] >= 1


def test_full_ranking_sharded_matches_dense():
    """Sharded full ranking (row-sharded table, per-shard rank counts +
    psum) reproduces the dense sweep's metrics exactly — including a
    table size NOT divisible by the shard count (pad rows are inert)."""
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
    from mpqe_tpu.parallel import mesh as mesh_lib

    kg = make_random_kg(n_entities=83, n_modes=2, n_base_rels=3,
                        n_triples=400, seed=62)
    sampler = QuerySampler(kg, seed=4)
    qs = (sampler.sample_queries("1-chain", 15, n_neg=1)
          + sampler.sample_queries("2-inter", 10, n_neg=1)
          + sampler.sample_queries("3-chain", 10, n_neg=1))
    grouped = group_queries_by_formula(qs)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=2, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(1), cfg)
    dense = evaluation.full_ranking(params, cfg, grouped, kg.entity_mode)
    mesh = mesh_lib.make_mesh((2, 4), devices=jax.devices()[:8])
    sharded = evaluation.full_ranking_sharded(
        params, cfg, grouped, kg.entity_mode, mesh)
    assert set(sharded) == set(dense)
    for s in dense:
        for metric, v in dense[s].items():
            assert abs(sharded[s][metric] - v) < 1e-9, (s, metric)


def test_full_ranking_sharded_rejects_gqe():
    from mpqe_tpu.models import gqe as gqe_mod
    from mpqe_tpu.parallel import mesh as mesh_lib

    cfg = gqe_mod.GQEConfig(n_entities=10, n_modes=1, n_rels=2,
                            embed_dim=8)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh((1, 2), devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="MPQE"):
        evaluation.full_ranking_sharded(
            params, cfg, {}, np.zeros(10, np.int32), mesh)
