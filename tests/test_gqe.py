"""GQE baselines: metapath decoders, set intersections, SoftAnd, training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.data.batcher import make_dense_batch
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import gqe as gqe_mod


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=100, n_modes=2, n_base_rels=4,
                          n_triples=400, seed=17)


def _cfg(kg, **kw):
    return gqe_mod.GQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, **kw,
    )


def _batch(kg, structure, B=8, seed=1):
    sampler = QuerySampler(kg, seed=seed)
    qs = sampler.sample_queries(structure, B, n_neg=4)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < B:
        q = sampler.sample_query(structure, n_neg=4)
        if q and q.formula == f:
            qs.append(q)
    return make_dense_batch(f, qs[:B], batch_size=B, n_neg=4)


@pytest.mark.parametrize("decoder", ["bilinear", "transe", "distmult"])
@pytest.mark.parametrize("structure", ["2-chain", "3-inter", "3-chain_inter"])
def test_encode_shapes_and_finiteness(kg, decoder, structure):
    cfg = _cfg(kg, decoder=decoder, intersection="min")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(0), cfg)
    b = _batch(kg, structure)
    q = gqe_mod.encode_dense(
        params, cfg, structure, jnp.asarray(b.node_entity),
        jnp.asarray(b.node_mode), jnp.asarray(b.edge_rel),
        jnp.asarray(b.edge_norm),
    )
    assert q.shape == (b.batch_size, cfg.embed_dim)
    assert np.isfinite(np.asarray(q)).all()


def test_chain_composition_matches_manual(kg):
    """2-chain bilinear: q = e_a @ W_r0 @ W_r1 exactly."""
    cfg = _cfg(kg, decoder="bilinear", intersection="min")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(1), cfg)
    b = _batch(kg, "2-chain")
    q = np.asarray(gqe_mod.encode_dense(
        params, cfg, "2-chain", jnp.asarray(b.node_entity),
        jnp.asarray(b.node_mode), jnp.asarray(b.edge_rel),
        jnp.asarray(b.edge_norm)))
    ent = np.asarray(params["emb"]["ent"])
    w = np.asarray(params["rel_mat"])
    r0, r1 = b.edge_rel
    want = ent[b.node_entity[:, 0]] @ w[r0] @ w[r1]
    np.testing.assert_allclose(q, want, rtol=2e-4, atol=2e-4)


def test_intersection_min_matches_manual(kg):
    """2-inter distmult with min intersection: elementwise min of branches."""
    cfg = _cfg(kg, decoder="distmult", intersection="min")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(2), cfg)
    b = _batch(kg, "2-inter")
    q = np.asarray(gqe_mod.encode_dense(
        params, cfg, "2-inter", jnp.asarray(b.node_entity),
        jnp.asarray(b.node_mode), jnp.asarray(b.edge_rel),
        jnp.asarray(b.edge_norm)))
    ent = np.asarray(params["emb"]["ent"])
    diag = np.asarray(params["rel_diag"])
    b0 = ent[b.node_entity[:, 0]] * diag[b.edge_rel[0]]
    b1 = ent[b.node_entity[:, 1]] * diag[b.edge_rel[1]]
    np.testing.assert_allclose(q, np.minimum(b0, b1), rtol=2e-4, atol=2e-4)


def test_softand_scores_min_of_branches(kg):
    cfg = _cfg(kg, decoder="transe", intersection="min", soft_and=True)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(3), cfg)
    b = _batch(kg, "3-inter")
    s = np.asarray(gqe_mod.score_queries(
        params, cfg, "3-inter", jnp.asarray(b.node_entity),
        jnp.asarray(b.edge_rel), jnp.asarray(b.target)))
    # manual: min over per-branch cosine scores
    ent = np.asarray(params["emb"]["ent"])
    rv = np.asarray(params["rel_vec"])
    branches = [ent[b.node_entity[:, i]] + rv[b.edge_rel[i]] for i in range(3)]
    tgt = ent[b.target]
    def cos(a, c):
        a = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
        c = c / (np.linalg.norm(c, axis=-1, keepdims=True) + 1e-12)
        return (a * c).sum(-1)
    want = np.min(np.stack([cos(x, tgt) for x in branches]), axis=0)
    np.testing.assert_allclose(s, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("intersection", ["min", "deepsets"])
def test_gqe_trains(kg, intersection):
    import optax
    cfg = _cfg(kg, decoder="bilinear", intersection=intersection)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(4), cfg)
    b = _batch(kg, "2-inter", B=16)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return gqe_mod.dense_batch_loss(
                p, cfg, "2-inter",
                jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
                jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
                jnp.asarray(b.target), jnp.asarray(b.negatives),
                jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::10]


@pytest.mark.parametrize("decoder", ["bilinear", "transe", "distmult"])
def test_encode_dense_multi_matches_per_formula(kg, decoder):
    """Per-query-relation GQE encoder == encode_dense per formula on the
    concatenation of several formulas of one structure (exact)."""
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.train import evaluation

    cfg = _cfg(kg, decoder=decoder, intersection="deepsets")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(6), cfg)
    sampler = QuerySampler(kg, seed=13)
    qs = sampler.sample_queries("3-chain_inter", 40, n_neg=4)
    grouped = group_queries_by_formula(qs)["3-chain_inter"]
    assert len(grouped) >= 2, "need several formulas for the test"

    es = evaluation.make_eval_set({"3-chain_inter": grouped})
    data = es.by_structure["3-chain_inter"]
    got = np.asarray(gqe_mod.encode_dense_multi(
        params, cfg, "3-chain_inter",
        jnp.asarray(data["node_entity"]), jnp.asarray(data["node_mode"]),
        jnp.asarray(data["edge_rel"]), jnp.asarray(data["edge_norm"]),
    ))

    rows = []
    for formula, fqs in grouped.items():
        fqs = [q for q in fqs if q.neg_samples]
        if not fqs:
            continue
        b = make_dense_batch(formula, fqs, batch_size=len(fqs), n_neg=1)
        q = np.asarray(gqe_mod.encode_dense(
            params, cfg, "3-chain_inter",
            jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
            jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        ))
        rows.append(q[: b.n_queries])
    want = np.concatenate(rows)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("soft_and", [False, True])
def test_evaluate_batched_gqe(kg, soft_and):
    """evaluate_batched routes GQE configs through score_pos_neg
    (SoftAnd = conjunct-min), yielding sane per-structure metrics."""
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.train import evaluation

    cfg = _cfg(kg, decoder="bilinear", intersection="min",
               soft_and=soft_and)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(7), cfg)
    sampler = QuerySampler(kg, seed=19)
    qs = (sampler.sample_queries("2-chain", 30, n_neg=16)
          + sampler.sample_queries("2-inter", 30, n_neg=16, n_hard_neg=8))
    es = evaluation.make_eval_set(group_queries_by_formula(qs))
    res = evaluation.evaluate_batched(params, cfg, es, n_neg=16)
    assert set(res.auc_by_structure) == {"2-chain", "2-inter"}
    for v in res.auc_by_structure.values():
        assert 0.0 <= v <= 1.0
    for v in res.apr_by_structure.values():
        assert 0.0 <= v <= 100.0


def _nbr_table(kg, fanout=6, seed=3):
    from mpqe_tpu.models import aggregators as agg_mod

    nt = agg_mod.build_neighbor_table(kg, fanout=fanout, seed=seed)
    return {"idx": jnp.asarray(nt["idx"]), "mask": jnp.asarray(nt["mask"])}


def test_neighborhood_encoder_matches_aggregator_math(kg):
    """encoder='neighborhood' anchors == aggregators.encode_entities
    composed through the same relation maps (2-chain bilinear)."""
    from mpqe_tpu.models import aggregators as agg_mod

    cfg = _cfg(kg, decoder="bilinear", intersection="min",
               encoder="neighborhood", aggregator="mean")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(11), cfg)
    nt = _nbr_table(kg)
    b = _batch(kg, "2-chain")
    q = np.asarray(gqe_mod.encode_dense(
        params, cfg, "2-chain", jnp.asarray(b.node_entity),
        jnp.asarray(b.node_mode), jnp.asarray(b.edge_rel),
        jnp.asarray(b.edge_norm), neighbor_table=nt))
    anchor = np.asarray(agg_mod.encode_entities(
        params["nbr"], params["emb"]["ent"], nt["idx"], nt["mask"],
        jnp.asarray(b.node_entity[:, 0]), "mean"))
    w = np.asarray(params["rel_mat"])
    r0, r1 = b.edge_rel
    want = anchor @ w[r0] @ w[r1]
    np.testing.assert_allclose(q, want, rtol=2e-4, atol=2e-4)
    # and it differs from the direct-encoder path (the table is live)
    q_direct = np.asarray(gqe_mod.encode_dense(
        params, cfg.__class__(**{**dataclasses.asdict(cfg),
                                 "encoder": "direct"}),
        "2-chain", jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm)))
    assert np.abs(q - q_direct).max() > 1e-4


def test_neighborhood_missing_table_raises(kg):
    cfg = _cfg(kg, encoder="neighborhood")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(12), cfg)
    b = _batch(kg, "2-chain")
    with pytest.raises(ValueError, match="neighbor_table"):
        gqe_mod.encode_dense(
            params, cfg, "2-chain", jnp.asarray(b.node_entity),
            jnp.asarray(b.node_mode), jnp.asarray(b.edge_rel),
            jnp.asarray(b.edge_norm))


@pytest.mark.parametrize("aggregator", ["mean", "pool"])
def test_neighborhood_encoder_trains_and_evals(kg, aggregator):
    """Loss decreases through the partial-bound table and
    evaluate_batched accepts the same table (train/eval agreement)."""
    import functools

    import optax

    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.train import evaluation

    cfg = _cfg(kg, decoder="bilinear", intersection="min",
               encoder="neighborhood", aggregator=aggregator)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(13), cfg)
    nt = _nbr_table(kg)
    loss_with_table = functools.partial(
        gqe_mod.dense_batch_loss, neighbor_table=nt)
    b = _batch(kg, "2-inter", B=16)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return loss_with_table(
                p, cfg, "2-inter",
                jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
                jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
                jnp.asarray(b.target), jnp.asarray(b.negatives),
                jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # the combine weights must receive gradient (encoder is live)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), grads["nbr"], 0.0)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, gnorm

    losses, gnorms = [], []
    for _ in range(40):
        params, opt_state, loss, gnorm = step(params, opt_state)
        losses.append(float(loss))
        gnorms.append(float(gnorm))
    assert losses[-1] < 0.7 * losses[0], losses[::10]
    assert max(gnorms) > 0.0

    sampler = QuerySampler(kg, seed=23)
    qs = sampler.sample_queries("2-inter", 30, n_neg=16)
    es = evaluation.make_eval_set(group_queries_by_formula(qs))
    res = evaluation.evaluate_batched(
        params, cfg, es, n_neg=16, neighbor_table=nt)
    assert 0.0 <= res.auc_by_structure["2-inter"] <= 1.0


# ---- box decoder (Query2Box geometry; round-5 extension, not in the
# reference — see docs/quality/quality5_hard_train.md) ----------------

def test_box_semantics_containment(kg):
    # a point inside the box scores -alpha*din; outside adds dout < 0
    cfg = _cfg(kg, decoder="box", box_alpha=0.02)
    d = cfg.embed_dim
    c = jnp.zeros((1, d))
    o = jnp.ones((1, d)) * 0.5
    inside = jnp.ones((1, d)) * 0.25
    outside = jnp.ones((1, d)) * 2.0
    s_in = gqe_mod.box_score(cfg, c, o, inside)[0]
    s_out = gqe_mod.box_score(cfg, c, o, outside)[0]
    assert float(s_in) > float(s_out)
    # inside score = -alpha * sum(min(|e-c|, o)) / sqrt(d)
    want = -0.02 * (0.25 * d) / np.sqrt(d)
    np.testing.assert_allclose(float(s_in), want, rtol=1e-5)


def test_box_intersection_shrinks(kg):
    cfg = _cfg(kg, decoder="box")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    d = cfg.embed_dim
    boxes = [(jnp.asarray(rng.normal(size=(4, d)).astype(np.float32)),
              jnp.asarray(rng.uniform(0.1, 1.0, (4, d)).astype(np.float32)))
             for _ in range(3)]
    c, o = gqe_mod._intersect_box(cfg, params, boxes)
    omin = jnp.min(jnp.stack([b[1] for b in boxes], 0), axis=0)
    assert c.shape == (4, d) and o.shape == (4, d)
    # offsets never exceed the smallest branch box (sigmoid shrink)
    assert bool(jnp.all(o <= omin + 1e-6))


@pytest.mark.parametrize("structure", ["2-chain", "2-inter",
                                       "3-chain_inter"])
def test_box_scoring_paths_consistent(kg, structure):
    # score_pos_neg, score_queries, and box_score_all must agree
    cfg = _cfg(kg, decoder="box")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(1), cfg)
    b = _batch(kg, structure)
    er = jnp.asarray(b.edge_rel)
    ne = jnp.asarray(b.node_entity)
    tgt = jnp.asarray(b.target)
    neg = jnp.asarray(b.negatives)
    pos, negs = gqe_mod.score_pos_neg(params, cfg, structure, ne, er,
                                      tgt, neg)
    sq_pos = gqe_mod.score_queries(params, cfg, structure, ne, er, tgt)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(sq_pos),
                               rtol=1e-5, atol=1e-6)
    box = gqe_mod.encode_dense(params, cfg, structure, ne, None, er, None)
    all_sc = gqe_mod.box_score_all(params, cfg, box, chunk=32)
    np.testing.assert_allclose(
        np.asarray(all_sc[np.arange(len(b.target)), b.target]),
        np.asarray(pos), rtol=1e-5, atol=1e-6)


def test_box_softand_is_min_of_branch_scores(kg):
    cfg = _cfg(kg, decoder="box", soft_and=True)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(2), cfg)
    b = _batch(kg, "2-inter")
    ne, er = jnp.asarray(b.node_entity), jnp.asarray(b.edge_rel)
    pos, _ = gqe_mod.score_pos_neg(params, cfg, "2-inter", ne, er,
                                   jnp.asarray(b.target),
                                   jnp.asarray(b.negatives))
    branches = gqe_mod.branch_vectors(params, cfg, "2-inter", ne, er)
    ent = params["emb"]["ent"]
    want = jnp.min(jnp.stack(
        [gqe_mod.box_score(cfg, c, o, ent[jnp.asarray(b.target)])
         for c, o in branches], 0), axis=0)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(want),
                               rtol=1e-5)


def test_box_trains_and_separates(kg):
    # margin loss decreases and held-out-free sanity: pos > mean neg
    import optax

    cfg = _cfg(kg, decoder="box")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(3), cfg)
    b = _batch(kg, "2-inter", B=32)
    args = (jnp.asarray(b.node_entity), None, jnp.asarray(b.edge_rel),
            None, jnp.asarray(b.target), jnp.asarray(b.negatives),
            jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask))
    opt = optax.adam(0.01)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda pp: gqe_mod.dense_batch_loss(pp, cfg, "2-inter", *args)
        )(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    l0 = None
    for _ in range(60):
        params, st, l = step(params, st)
        l0 = l0 if l0 is not None else float(l)
    assert float(l) < 0.5 * l0, (l0, float(l))


def test_box_evaluate_batched_and_ranking(kg):
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.train import evaluation

    cfg = _cfg(kg, decoder="box")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(4), cfg)
    sampler = QuerySampler(kg, seed=9)
    qs = group_queries_by_formula(
        sampler.sample_queries("2-inter", 24, n_neg=8))
    es = evaluation.make_eval_set(qs)
    res = evaluation.evaluate_batched(params, cfg, es)
    assert np.isfinite(res.macro_auc)
    fr = evaluation.full_ranking(params, cfg, qs, kg.entity_mode)
    mrr = fr["2-inter"]["mrr"]
    assert np.isfinite(mrr) and 0.0 < mrr <= 1.0


def test_box_serving(kg):
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.serve import QueryServer

    cfg = _cfg(kg, decoder="box")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(5), cfg)
    sampler = QuerySampler(kg, seed=11)
    qs = sampler.sample_queries("2-chain", 6, n_neg=4)
    srv = QueryServer(params, cfg, kg.entity_mode)
    out = srv.answer(qs, k=5)
    assert len(out) == 6
    assert all(o.entity_ids.shape == (5,) for o in out)
    # ranking agrees with the box scorer + mode mask
    b = _batch(kg, "2-chain", B=8)
    with pytest.raises(ValueError, match="box-decoder serving"):
        QueryServer(params, cfg, kg.entity_mode, table_dtype="int8")


# ---- bibox hybrid decoder (round-5 extension: bilinear point head +
# Query2Box box head over one shared entity table; fused score =
# cosine + bibox_w * box affinity — docs/quality/quality5_bibox.md) ---

def test_bibox_score_is_sum_of_heads(kg):
    cfg = _cfg(kg, decoder="bibox", bibox_w=0.7)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(6), cfg)
    b = _batch(kg, "2-inter")
    ne, er = jnp.asarray(b.node_entity), jnp.asarray(b.edge_rel)
    vec, (c, o) = gqe_mod.encode_dense(params, cfg, "2-inter", ne, None,
                                       er, None)
    ent = params["emb"]["ent"]
    tgt = jnp.asarray(b.target)
    pos, _ = gqe_mod.score_pos_neg(params, cfg, "2-inter", ne, er, tgt,
                                   jnp.asarray(b.negatives))
    from mpqe_tpu.models import mpqe as mpqe_mod

    want = (mpqe_mod.score(gqe_mod._score_cfg(cfg), vec, ent[tgt])
            + 0.7 * gqe_mod.box_score(cfg, c, o, ent[tgt]))
    np.testing.assert_allclose(np.asarray(pos), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # bibox_w=0 degenerates to the pure cosine point head
    cfg0 = _cfg(kg, decoder="bibox", bibox_w=0.0)
    pos0, _ = gqe_mod.score_pos_neg(params, cfg0, "2-inter", ne, er, tgt,
                                    jnp.asarray(b.negatives))
    want0 = mpqe_mod.score(gqe_mod._score_cfg(cfg), vec, ent[tgt])
    np.testing.assert_allclose(np.asarray(pos0), np.asarray(want0),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("structure", ["2-chain", "2-inter",
                                       "3-chain_inter"])
def test_bibox_scoring_paths_consistent(kg, structure):
    cfg = _cfg(kg, decoder="bibox")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(7), cfg)
    b = _batch(kg, structure)
    ne, er = jnp.asarray(b.node_entity), jnp.asarray(b.edge_rel)
    tgt, neg = jnp.asarray(b.target), jnp.asarray(b.negatives)
    pos, negs = gqe_mod.score_pos_neg(params, cfg, structure, ne, er,
                                      tgt, neg)
    sq_pos = gqe_mod.score_queries(params, cfg, structure, ne, er, tgt)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(sq_pos),
                               rtol=1e-5, atol=1e-6)
    rep = gqe_mod.encode_dense(params, cfg, structure, ne, None, er, None)
    all_sc = gqe_mod.bibox_score_all(params, cfg, rep, chunk=32)
    np.testing.assert_allclose(
        np.asarray(all_sc[np.arange(len(b.target)), b.target]),
        np.asarray(pos), rtol=1e-5, atol=1e-6)
    # shared-row sweep (the training-protocol path) agrees too
    rows = params["emb"]["ent"][jnp.asarray(b.target)]
    sw = gqe_mod.bibox_score_rows(cfg, rep, rows)
    np.testing.assert_allclose(
        np.asarray(sw[np.arange(len(b.target)), np.arange(len(b.target))]),
        np.asarray(pos), rtol=1e-5, atol=1e-6)


def test_bibox_softand_is_min_of_branch_scores(kg):
    cfg = _cfg(kg, decoder="bibox", soft_and=True)
    params = gqe_mod.init_gqe(jax.random.PRNGKey(8), cfg)
    b = _batch(kg, "2-inter")
    ne, er = jnp.asarray(b.node_entity), jnp.asarray(b.edge_rel)
    pos, _ = gqe_mod.score_pos_neg(params, cfg, "2-inter", ne, er,
                                   jnp.asarray(b.target),
                                   jnp.asarray(b.negatives))
    branches = gqe_mod.branch_vectors(params, cfg, "2-inter", ne, er)
    ent = params["emb"]["ent"]
    want = jnp.min(jnp.stack(
        [gqe_mod.bibox_score(cfg, r, ent[jnp.asarray(b.target)])
         for r in branches], 0), axis=0)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(want),
                               rtol=1e-5)


def test_bibox_trains_and_separates(kg):
    import optax

    cfg = _cfg(kg, decoder="bibox")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(9), cfg)
    b = _batch(kg, "2-inter", B=32)
    args = (jnp.asarray(b.node_entity), None, jnp.asarray(b.edge_rel),
            None, jnp.asarray(b.target), jnp.asarray(b.negatives),
            jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask))
    opt = optax.adam(0.01)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda pp: gqe_mod.dense_batch_loss(pp, cfg, "2-inter", *args)
        )(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    l0 = None
    for _ in range(60):
        params, st, l = step(params, st)
        l0 = l0 if l0 is not None else float(l)
    assert float(l) < 0.5 * l0, (l0, float(l))
    # both heads received gradient: rel_mat moved AND rel_off moved
    fresh = gqe_mod.init_gqe(jax.random.PRNGKey(9), cfg)
    assert not np.allclose(np.asarray(params["rel_mat"]),
                           np.asarray(fresh["rel_mat"]))
    assert not np.allclose(np.asarray(params["rel_off"]),
                           np.asarray(fresh["rel_off"]))


def test_bibox_evaluate_batched_ranking_and_serving(kg):
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.serve import QueryServer
    from mpqe_tpu.train import evaluation

    cfg = _cfg(kg, decoder="bibox")
    params = gqe_mod.init_gqe(jax.random.PRNGKey(10), cfg)
    sampler = QuerySampler(kg, seed=13)
    qs = group_queries_by_formula(
        sampler.sample_queries("2-inter", 24, n_neg=8))
    es = evaluation.make_eval_set(qs)
    res = evaluation.evaluate_batched(params, cfg, es)
    assert np.isfinite(res.macro_auc)
    fr = evaluation.full_ranking(params, cfg, qs, kg.entity_mode)
    mrr = fr["2-inter"]["mrr"]
    assert np.isfinite(mrr) and 0.0 < mrr <= 1.0
    # serving: cosine head rides the quantized table, box head the raw
    # f32 params — int8 tables are ALLOWED (unlike pure box serving)
    for dt in ("float32", "int8"):
        srv = QueryServer(params, cfg, kg.entity_mode, table_dtype=dt)
        out = srv.answer(sampler.sample_queries("2-chain", 6, n_neg=4),
                         k=5)
        assert len(out) == 6
        assert all(o.entity_ids.shape == (5,) for o in out)
