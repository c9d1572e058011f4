"""QueryServer: trained model answers queries with true targets ranked
top-k; mixed structures/formulas batch together; mode masking holds."""

import jax
import numpy as np
import pytest

from mpqe_tpu.data.sampler import QuerySampler, make_rule_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import group_queries_by_formula
from mpqe_tpu.serve import QueryServer
from mpqe_tpu.train import loop as loop_mod


@pytest.fixture(scope="module")
def trained():
    kg = make_rule_kg(n_entities=200, n_modes=2, n_base_rels=4,
                      out_degree=1, seed=11)
    sampler = QuerySampler(kg, seed=1)
    train_q = group_queries_by_formula(
        sampler.all_edge_queries(n_neg=16)
        + sampler.sample_queries("2-chain", 400, n_neg=16)
        + sampler.sample_queries("2-inter", 300, n_neg=16)
    )
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=32, n_layers=2, num_bases=4, readout="tgt",
    )
    # conv_tol > 0 so the 1-chain burn-in actually ENDS and the multi-hop
    # structures train (tight tol: the no-validation plateau check stops
    # the run once loss flattens)
    tc = loop_mod.TrainConfig(lr=0.01, batch_size=128, n_neg=8,
                              max_steps=2500, conv_tol=1e-5,
                              conv_window=60, val_every=100_000)
    state = loop_mod.init_train_state(jax.random.PRNGKey(0), cfg, tc)
    state = loop_mod.run_train(state, cfg, tc, train_q)
    return kg, cfg, state, sampler


def test_server_ranks_true_answers_topk(trained):
    kg, cfg, state, sampler = trained
    server = QueryServer(state.params, cfg, kg.entity_mode)
    qs = (sampler.sample_queries("1-chain", 20, n_neg=1)
          + sampler.sample_queries("2-chain", 20, n_neg=1))
    answers = server.answer(qs, k=10)
    assert len(answers) == len(qs)
    hits = sum(
        1 for q, a in zip(qs, answers) if q.target in a.entity_ids.tolist())
    assert hits >= int(0.7 * len(qs)), f"only {hits}/{len(qs)} hit top-10"
    # scores sorted descending
    for a in answers:
        assert np.all(np.diff(a.scores) <= 1e-6)


def test_server_mode_masking(trained):
    kg, cfg, state, sampler = trained
    server = QueryServer(state.params, cfg, kg.entity_mode)
    qs = sampler.sample_queries("2-inter", 12, n_neg=1)
    answers = server.answer(qs, k=8)
    for q, a in zip(qs, answers):
        t_mode = q.formula.node_modes[q.formula.spec.target_slot]
        assert all(kg.entity_mode[e] == t_mode for e in a.entity_ids)


def test_server_mixed_structures_one_request(trained):
    kg, cfg, state, sampler = trained
    server = QueryServer(state.params, cfg, kg.entity_mode)
    qs = []
    for s in ["1-chain", "2-chain", "2-inter", "3-inter"]:
        qs += sampler.sample_queries(s, 3, n_neg=1)
    rng = np.random.default_rng(0)
    rng.shuffle(qs)
    answers = server.answer(qs, k=5)
    # answers aligned with the (shuffled) input order
    assert len(answers) == len(qs)
    for a in answers:
        assert a is not None and a.entity_ids.shape == (5,)


def test_server_full_weight_model(trained):
    """Full-weight (no basis) models serve through the same batched
    per-query-relation encoder (w_rel gathered per query)."""
    kg, _, _, sampler = trained
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=None, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
    server = QueryServer(params, cfg, kg.entity_mode)
    qs = (sampler.sample_queries("2-chain", 6, n_neg=1)
          + sampler.sample_queries("2-inter", 6, n_neg=1))
    answers = server.answer(qs, k=5)
    assert len(answers) == len(qs)
    for q, a in zip(qs, answers):
        assert a.entity_ids.shape == (5,)
        t_mode = q.formula.node_modes[q.formula.spec.target_slot]
        assert all(kg.entity_mode[e] == t_mode for e in a.entity_ids)


def test_server_warmup_compiles_buckets(trained):
    kg, cfg, state, sampler = trained
    server = QueryServer(state.params, cfg, kg.entity_mode)
    server.warmup(["1-chain"], batch=4, k=5)
    # subsequent calls reuse the cached executables (cache populated)
    assert len(server._rank_fns) >= 1


@pytest.mark.parametrize("soft_and", [False, True])
def test_server_gqe_model(trained, soft_and):
    """GQE checkpoints serve through the same batched rank program
    (SoftAnd ranks by conjunct-min scores over all candidates)."""
    from mpqe_tpu.models import gqe as gqe_mod

    kg, _, _, sampler = trained
    cfg = gqe_mod.GQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, decoder="bilinear", intersection="min",
        soft_and=soft_and,
    )
    params = gqe_mod.init_gqe(jax.random.PRNGKey(5), cfg)
    server = QueryServer(params, cfg, kg.entity_mode)
    qs = (sampler.sample_queries("2-chain", 6, n_neg=1)
          + sampler.sample_queries("2-inter", 6, n_neg=1))
    answers = server.answer(qs, k=5)
    assert len(answers) == len(qs)
    for q, a in zip(qs, answers):
        assert a.entity_ids.shape == (5,)
        assert np.all(np.isfinite(a.scores))
        t_mode = q.formula.node_modes[q.formula.spec.target_slot]
        assert all(kg.entity_mode[e] == t_mode for e in a.entity_ids)


def test_server_max_batch_is_power_of_two_and_cache_is_instance_level(
        trained):
    """The effective batch cap rounds DOWN to a power of two (so warmup's
    pow2 buckets cover every shape answer() can produce), and the rank-fn
    cache lives on the instance, not in a module-global lru_cache that
    would pin params for process lifetime."""
    kg, cfg, state, sampler = trained
    # a non-pow2 requested cap must round down
    server = QueryServer(state.params, cfg, kg.entity_mode, max_batch=300)
    assert server.max_batch == 256
    assert server.max_batch & (server.max_batch - 1) == 0
    qs = sampler.sample_queries("1-chain", 3, n_neg=1)
    server.answer(qs, k=5)
    assert ("1-chain", 5) in server._rank_fns
    # a second server has its own empty cache; deleting a server frees it
    other = QueryServer(state.params, cfg, kg.entity_mode)
    assert other._rank_fns == {}
    import weakref

    ref = weakref.ref(other)
    del other
    assert ref() is None, "server instance retained after del"


def test_server_gqe_neighborhood_model(trained):
    """encoder='neighborhood' GQE checkpoints serve with the fanout
    table threaded into the rank program; missing table raises."""
    from mpqe_tpu.models import aggregators as agg_mod
    from mpqe_tpu.models import gqe as gqe_mod

    kg, _, _, sampler = trained
    cfg = gqe_mod.GQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, decoder="bilinear", intersection="min",
        encoder="neighborhood", aggregator="mean",
    )
    params = gqe_mod.init_gqe(jax.random.PRNGKey(6), cfg)
    with pytest.raises(ValueError, match="neighbor_table"):
        QueryServer(params, cfg, kg.entity_mode)
    nt = agg_mod.build_neighbor_table(kg, fanout=4, seed=0)
    server = QueryServer(params, cfg, kg.entity_mode, neighbor_table=nt)
    qs = (sampler.sample_queries("2-chain", 6, n_neg=1)
          + sampler.sample_queries("2-inter", 6, n_neg=1))
    answers = server.answer(qs, k=5)
    assert len(answers) == len(qs)
    for q, a in zip(qs, answers):
        assert a.entity_ids.shape == (5,)
        assert np.all(np.isfinite(a.scores))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_server_quantized_table_recall(trained, dtype):
    """Quantized candidate tables keep the ranking: top-10 overlap with
    the f32 server stays high on a trained model (int8's worst case is
    ~1/127 per-component noise on [-1,1]-normalized rows)."""
    kg, cfg, state, sampler = trained
    f32 = QueryServer(state.params, cfg, kg.entity_mode)
    qt = QueryServer(state.params, cfg, kg.entity_mode, table_dtype=dtype)
    qs = (sampler.sample_queries("1-chain", 15, n_neg=1)
          + sampler.sample_queries("2-chain", 15, n_neg=1))
    a_f = f32.answer(qs, k=10)
    a_q = qt.answer(qs, k=10)
    overlaps = [
        len(set(f.entity_ids.tolist()) & set(q.entity_ids.tolist())) / 10
        for f, q in zip(a_f, a_q)]
    assert np.mean(overlaps) >= 0.8, f"mean top-10 overlap {np.mean(overlaps)}"
    # scores stay in cosine units (the int8 path rescales by 1/127^2)
    for f, q in zip(a_f, a_q):
        np.testing.assert_allclose(q.scores, f.scores, atol=0.05)


def test_server_int8_requires_cosine(trained):
    kg, cfg, state, _ = trained
    import dataclasses as dc

    cfg_raw = dc.replace(cfg, scale_scores=False)
    with pytest.raises(ValueError, match="cosine"):
        QueryServer(state.params, cfg_raw, kg.entity_mode,
                    table_dtype="int8")
