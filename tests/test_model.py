"""MPQE model: dense == sparse == NumPy oracle; loss; all readouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.data.batcher import dense_to_sparse, make_dense_batch
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.models import embeddings as emb_mod
from mpqe_tpu.utils import oracle


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=80, n_modes=3, n_base_rels=4,
                          n_triples=900, seed=3)


def _cfg(kg, readout="tgt", num_bases=2, n_layers=3):
    return mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities,
        n_modes=kg.n_modes,
        n_rels=kg.n_rels,
        embed_dim=16,
        n_layers=n_layers,
        num_bases=num_bases,
        readout=readout,
    )


def _batch(kg, structure, B=8, n_neg=4, seed=5):
    sampler = QuerySampler(kg, seed=seed)
    qs = sampler.sample_queries(structure, B, n_neg=n_neg)
    f = qs[0].formula
    qs = [q if q.formula == f else
          sampler.sample_queries(structure, 1, n_neg=n_neg)[0] for q in qs]
    # simplest: just resample until same formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < B:
        q = sampler.sample_query(structure, n_neg=n_neg)
        if q and q.formula == f:
            qs.append(q)
    return make_dense_batch(f, qs[:B], batch_size=B, n_neg=n_neg)


@pytest.mark.parametrize("structure", ["1-chain", "2-chain", "3-chain_inter"])
@pytest.mark.parametrize("readout", ["tgt", "sum", "max"])
def test_dense_matches_sparse_and_oracle(kg, structure, readout):
    cfg = _cfg(kg, readout=readout)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    b = _batch(kg, structure)
    sb = dense_to_sparse(b, n_rels=cfg.n_rels)

    q_dense = np.asarray(
        mpqe_mod.encode_dense(
            params, cfg, structure,
            jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
            jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        )
    )
    q_sparse = np.asarray(
        mpqe_mod.encode_sparse(
            params, cfg, structure,
            jnp.asarray(sb.node_entity), jnp.asarray(sb.node_mode),
            jnp.asarray(sb.node_is_var),
            jnp.asarray(sb.edges.src), jnp.asarray(sb.edges.dst),
            jnp.asarray(sb.edges.rel), jnp.asarray(sb.edges.norm),
            jnp.asarray(sb.node_query), jnp.asarray(sb.target_node),
            n_queries=b.batch_size,
        )
    )
    np.testing.assert_allclose(q_dense, q_sparse, rtol=3e-4, atol=3e-4)

    # full oracle: embed (numpy) + message passing + readout
    x0 = np.asarray(
        emb_mod.embed_nodes_sparse(
            params["emb"], jnp.asarray(sb.node_entity),
            jnp.asarray(sb.node_mode), jnp.asarray(sb.node_is_var),
        )
    )
    np_params = jax.tree_util.tree_map(np.asarray, params)
    steps = mpqe_mod.num_steps(cfg, structure)
    q_np = oracle.mpqe_forward_np(
        np_params, cfg.n_rels, readout, x0,
        sb.edges.src, sb.edges.dst, sb.edges.rel, sb.edges.norm,
        sb.node_query, sb.target_node, b.batch_size, steps,
    )
    np.testing.assert_allclose(q_dense, q_np, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("structure", ["1-chain", "3-chain_inter"])
@pytest.mark.parametrize("readout", ["tgt", "sum"])
def test_fused_gather_loss_matches_naive(kg, structure, readout):
    """dense_batch_loss_fused routes all entity-table reads through one
    embedding_lookup; value AND gradients must match the default
    multi-gather formulation exactly."""
    cfg = _cfg(kg, readout=readout)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(2), cfg)
    b = _batch(kg, structure, B=16, n_neg=4)
    arrays = (
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        jnp.asarray(b.target), jnp.asarray(b.negatives),
        jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask),
    )

    def naive_loss(p):
        q = mpqe_mod.encode_dense(p, cfg, structure, *arrays[:4])
        return mpqe_mod.margin_loss_from_queries(
            p, cfg, q, *arrays[4:]
        )

    def fused_loss(p):
        return mpqe_mod.dense_batch_loss_fused(p, cfg, structure, *arrays)

    l0, g0 = jax.value_and_grad(naive_loss)(params)
    l1, g1 = jax.value_and_grad(fused_loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, c in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
        )


def test_shared_negatives_loss_matches_expanded(kg):
    """Batch-shared-negatives loss == the per-query loss with the shared
    set replicated to every query (same math, fewer table rows)."""
    cfg = _cfg(kg, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(4), cfg)
    b = _batch(kg, "2-chain", B=16, n_neg=4)
    K = 8
    rng = np.random.default_rng(11)
    sneg = jnp.asarray(rng.integers(0, kg.n_entities, K).astype(np.int32))
    arrays = (
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        jnp.asarray(b.target),
    )
    qmask = jnp.asarray(b.query_mask)
    got = float(mpqe_mod.dense_batch_loss_shared_negs(
        params, cfg, "2-chain", *arrays, sneg, qmask))
    # oracle: replicate the shared set as per-query negatives
    neg_rep = jnp.broadcast_to(sneg[None, :], (16, K))
    want = float(mpqe_mod.dense_batch_loss(
        params, cfg, "2-chain", *arrays, neg_rep,
        jnp.ones((16, K), jnp.float32), qmask))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_shared_negs_self_adv_matches_numpy(kg):
    """self_adv_tau > 0 reweights each query's candidate violations by
    softmax(tau * score) with masked pairs excluded — checked against a
    direct numpy computation from the same scores, including a padded
    query row (query_mask == 0) and a candidate that IS some query's
    target (not_self mask)."""
    cfg = _cfg(kg, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(4), cfg)
    b = _batch(kg, "2-chain", B=8, n_neg=4)
    K, tau = 6, 1.7
    rng = np.random.default_rng(12)
    sneg = rng.integers(0, kg.n_entities, K).astype(np.int32)
    sneg[2] = int(b.target[1])  # force a not_self-masked pair
    qmask = np.asarray(b.query_mask).copy()
    qmask[-1] = 0.0  # force a padded query
    arrays = (
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
        jnp.asarray(b.target),
    )
    got = float(mpqe_mod.dense_batch_loss_shared_negs(
        params, cfg, "2-chain", *arrays, jnp.asarray(sneg),
        jnp.asarray(qmask), self_adv_tau=tau))

    # numpy oracle from the model's own scores
    q = np.asarray(mpqe_mod.encode_dense(
        params, cfg, "2-chain", *arrays[:4]), np.float64)
    ent = np.asarray(params["emb"]["ent"], np.float64)
    pos_rows, neg_rows = ent[np.asarray(b.target)], ent[sneg]
    if cfg.scale_scores:
        qn = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        nn_ = neg_rows / (np.linalg.norm(neg_rows, axis=-1,
                                         keepdims=True) + 1e-12)
        pn = pos_rows / (np.linalg.norm(pos_rows, axis=-1,
                                        keepdims=True) + 1e-12)
    else:
        qn, nn_, pn = q, neg_rows, pos_rows
    pos = np.sum(qn * pn, axis=-1)
    sc = qn @ nn_.T
    viol = np.maximum(cfg.margin - pos[:, None] + sc, 0.0)
    w = (sneg[None, :] != np.asarray(b.target)[:, None]).astype(float)
    w *= qmask[:, None]
    total, n_live = 0.0, 0.0
    for i in range(8):
        live = w[i] > 0
        if not live.any():
            continue
        z = np.exp(tau * sc[i][live] - np.max(tau * sc[i][live]))
        total += float(np.sum(z / z.sum() * viol[i][live]))
        n_live += 1.0
    want = total / max(n_live, 1.0)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # gradient must exist and be finite (stop_gradient on the weights)
    g = jax.grad(lambda p: mpqe_mod.dense_batch_loss_shared_negs(
        p, cfg, "2-chain", *arrays, jnp.asarray(sneg),
        jnp.asarray(qmask), self_adv_tau=tau))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_tgt_depth_equals_diameter(kg):
    cfg = _cfg(kg, readout="tgt", n_layers=3)
    assert mpqe_mod.num_steps(cfg, "1-chain") == 1
    assert mpqe_mod.num_steps(cfg, "3-chain") == 3
    assert mpqe_mod.num_steps(cfg, "3-chain_inter") == 2
    cfg_sum = _cfg(kg, readout="sum", n_layers=3)
    assert mpqe_mod.num_steps(cfg_sum, "1-chain") == 3


@pytest.mark.parametrize("readout", ["concat", "mlp"])
def test_extra_readouts_shapes(kg, readout):
    cfg = _cfg(kg, readout=readout)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(1), cfg)
    b = _batch(kg, "2-inter")
    q = mpqe_mod.encode_dense(
        params, cfg, "2-inter",
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
    )
    assert q.shape == (b.batch_size, cfg.embed_dim)
    assert np.isfinite(np.asarray(q)).all()


def test_margin_loss_matches_numpy(kg, rng):
    cfg = _cfg(kg, readout="sum")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(2), cfg)
    b = _batch(kg, "2-chain", B=8, n_neg=4)
    q = mpqe_mod.encode_dense(
        params, cfg, "2-chain",
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
    )
    loss = float(
        mpqe_mod.margin_loss_from_queries(
            params, cfg, q, jnp.asarray(b.target), jnp.asarray(b.negatives),
            jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask),
        )
    )
    want = oracle.margin_loss_np(
        np.asarray(q), np.asarray(params["emb"]["ent"]), b.target,
        b.negatives, b.neg_mask, b.query_mask, margin=cfg.margin,
    )
    np.testing.assert_allclose(loss, want, rtol=1e-4, atol=1e-5)


def test_query_mask_excludes_padding(kg):
    """Padded queries must not change the loss."""
    cfg = _cfg(kg, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
    sampler = QuerySampler(kg, seed=9)
    qs = sampler.sample_queries("1-chain", 4, n_neg=4)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < 4:
        q = sampler.sample_query("1-chain", n_neg=4)
        if q and q.formula == f:
            qs.append(q)
    tight = make_dense_batch(f, qs, batch_size=4, n_neg=4)
    padded = make_dense_batch(f, qs, batch_size=16, n_neg=4)

    def loss_of(b):
        return float(mpqe_mod.dense_batch_loss(
            params, cfg, b.structure,
            jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
            jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
            jnp.asarray(b.target), jnp.asarray(b.negatives),
            jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask),
        ))

    np.testing.assert_allclose(loss_of(tight), loss_of(padded), rtol=1e-5)


def test_score_all_entities_shape(kg):
    cfg = _cfg(kg)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(4), cfg)
    q = jnp.ones((5, cfg.embed_dim))
    s = mpqe_mod.score_all_entities(params, cfg, q)
    assert s.shape == (5, kg.n_entities)
    assert np.all(np.abs(np.asarray(s)) <= 1.0 + 1e-5)


@pytest.mark.parametrize("readout", ["concat", "mlp"])
def test_concat_mlp_match_numpy_oracle(kg, readout):
    """Exact parity for the concat/mlp readouts (not just shapes)."""
    cfg = _cfg(kg, readout=readout, n_layers=1)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(8), cfg)
    b = _batch(kg, "3-inter_chain")
    q = np.asarray(mpqe_mod.encode_dense(
        params, cfg, "3-inter_chain",
        jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
        jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm)))
    # oracle: embed + 1 rgcn layer (flattened) + numpy readout
    sb = dense_to_sparse(b, n_rels=cfg.n_rels)
    x0 = np.asarray(emb_mod.embed_nodes_sparse(
        params["emb"], jnp.asarray(sb.node_entity),
        jnp.asarray(sb.node_mode), jnp.asarray(sb.node_is_var)))
    np_params = jax.tree_util.tree_map(np.asarray, params)
    x1 = oracle.rgcn_layer_np(
        x0, np_params["layers"][0], sb.edges.src, sb.edges.dst,
        sb.edges.rel, sb.edges.norm, cfg.n_rels)
    x_bnd = x1.reshape(b.batch_size, 4, cfg.embed_dim)
    if readout == "concat":
        want = oracle.readout_concat_np(np_params["readout"], x_bnd)
    else:
        want = oracle.readout_mlp_np(np_params["readout"], x_bnd)
    np.testing.assert_allclose(q, want, rtol=3e-4, atol=3e-4)
