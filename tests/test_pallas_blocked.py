"""Blocked bf16 R-GCN kernel (ops/pallas_rgcn_blocked) vs the f32 sparse
path — interpreter mode; compiled-mode parity/perf via tools/kernel_bench
--paths blocked on the chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import pallas_rgcn_blocked as prb
from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.ops.edge_store import build_edge_store

D = 16
N_RELS = 6


def _graph(rng, n_nodes=70, n_e=300):
    src = rng.integers(0, n_nodes, n_e).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_e).astype(np.int32)
    rel = rng.integers(0, N_RELS, n_e).astype(np.int32)
    return build_edge_store(src, dst, rel, n_nodes, N_RELS)


def test_bucket_invariants(rng):
    st = _graph(rng)
    bk = prb.bucket_edges_blocked(st, node_block=32, chunk=16)
    n_chunks = bk["chunk_src_blk"].shape[0]
    assert bk["src_local"].shape[0] == n_chunks * 16
    sb = bk["node_block"]
    # every real edge lands in the right (dst_blk, src_blk) tile
    rel_e = np.repeat(np.arange(n_chunks), 16)
    real = bk["src_local"] < sb
    src_g = bk["src_local"] + bk["chunk_src_blk"][rel_e] * sb
    dst_g = bk["dst_local"] + bk["chunk_dst_blk"][rel_e] * sb
    m = st.pad_mask
    orig = sorted(zip(st.src[m], st.dst[m], st.rel[m]))
    got = sorted(zip(src_g[real], dst_g[real], bk["rel"][real]))
    assert got == orig
    # all chunks of a dst block are contiguous, exactly one 'first' each
    c_dst = bk["chunk_dst_blk"]
    firsts = np.ones_like(c_dst)
    firsts[1:] = (c_dst[1:] != c_dst[:-1]).astype(c_dst.dtype)
    # each dst block appears in exactly one contiguous run
    runs = {}
    for i, d_blk in enumerate(c_dst):
        if d_blk in runs and runs[d_blk] != i - 1:
            raise AssertionError(f"dst block {d_blk} split across runs")
        runs[d_blk] = i
    # every dst block 0..n_blocks-1 appears (empty ones get pad chunks)
    assert set(c_dst.tolist()) == set(range(bk["n_blocks"]))


def test_blocked_matches_sparse_bf16_tolerance(rng):
    st = _graph(rng)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(0), D, D, N_RELS, 3)
    x = rng.normal(size=(st.n_nodes, D)).astype(np.float32)
    want = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel,
            jnp.asarray(st.norm), N_RELS,
        ))
    bk = prb.bucket_edges_blocked(st, node_block=32, chunk=16)
    got = np.asarray(prb.rgcn_sparse_blocked(
        jnp.asarray(x), p, bk, N_RELS, interpret=True))
    # bf16 matmuls: ~1e-2 relative
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def _msg_args(bk):
    fwd = (
        jnp.asarray(bk["src_local"]), jnp.asarray(bk["dst_local"]),
        jnp.asarray(bk["rel"]), jnp.asarray(bk["norm"]),
        jnp.asarray(bk["chunk_src_blk"]), jnp.asarray(bk["chunk_dst_blk"]),
    )
    t = (
        jnp.asarray(bk["t_src_local"]), jnp.asarray(bk["t_dst_local"]),
        jnp.asarray(bk["t_rel"]), jnp.asarray(bk["t_norm"]),
        jnp.asarray(bk["t_chunk_src_blk"]),
        jnp.asarray(bk["t_chunk_dst_blk"]),
    )
    return fwd, t


def test_blocked_gradients_match_f32_path(rng):
    """The Pallas backward (dx via the transpose-bucketed forward kernel,
    dbasis/dcoeff via the grad kernel) matches the composable f32 twin's
    grads to bf16-matmul tolerance."""
    st = _graph(rng, n_nodes=40, n_e=120)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(1), D, D, N_RELS, 3)
    x = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    bk = prb.bucket_edges_blocked(st, node_block=16, chunk=8)
    fwd_args, t_args = _msg_args(bk)
    g_out = jnp.asarray(
        rng.normal(size=(st.n_nodes, D)).astype(np.float32))

    def loss_blocked(x, basis, coeff):
        out = prb._blocked_messages(
            x, basis, coeff, *fwd_args, *t_args, N_RELS, 16, 8, True)
        return jnp.vdot(out, g_out)

    def loss_twin(x, basis, coeff):
        out = prb._messages_xla_twin(
            x, basis, coeff, *fwd_args, N_RELS, 16, 8)
        return jnp.vdot(out, g_out)

    g1 = jax.grad(loss_blocked, argnums=(0, 1, 2))(
        x, p["basis"], p["coeff"])
    g2 = jax.grad(loss_twin, argnums=(0, 1, 2))(x, p["basis"], p["coeff"])
    scale = [np.abs(np.asarray(b)).max() for b in g2]
    for a, b, s in zip(g1, g2, scale):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2 * s)


def test_blocked_backward_has_no_edge_basis_blowup(rng):
    """The backward jaxpr contains NO [E, Bb, do]-sized intermediate —
    the round-2 XLA-twin backward materialized exactly that (8 GB at the
    benched workload), making the fast path forward-only at scale."""
    # enough edges that the [E, Bb, do] threat dwarfs the lane-padded
    # parameter constants ([Bb, 128, 128] etc.), so the assertion tests
    # the edge-proportional blowup and not padding noise
    st = _graph(rng, n_nodes=64, n_e=3000)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(1), D, D, N_RELS, 3)
    x = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    bk = prb.bucket_edges_blocked(st, node_block=16, chunk=8)
    fwd_args, t_args = _msg_args(bk)
    e_pad = bk["src_local"].shape[0]
    bb = p["basis"].shape[0]
    blowup = e_pad * bb * D  # elements of the [E, Bb, do] intermediate
    assert blowup > 2 * bb * 128 * 128, "shape too small to be probative"

    def loss(x, basis, coeff):
        out = prb._blocked_messages(
            x, basis, coeff, *fwd_args, *t_args, N_RELS, 16, 8, True)
        return jnp.sum(out)

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(
        x, p["basis"], p["coeff"])

    def max_interm(jx):
        worst = 0
        for eqn in jx.eqns:
            for v in eqn.outvars:
                if hasattr(v.aval, "size"):
                    worst = max(worst, v.aval.size)
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    inner = sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub
                    worst = max(worst, max_interm(inner))
        return worst

    worst = max_interm(jaxpr.jaxpr)
    assert worst < blowup, (
        f"backward materializes a {worst}-element intermediate "
        f">= the [E, Bb, do] blowup ({blowup})")


def test_encode_sparse_blocked_matches_encode_sparse():
    """Full model forward through the blocked kernel == XLA sparse path
    (bf16 tolerance)."""
    from mpqe_tpu.data.batcher import dense_to_sparse, make_dense_batch
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
    from mpqe_tpu.models import mpqe as mpqe_mod

    kg = make_random_kg(n_entities=60, n_modes=2, n_base_rels=3,
                        n_triples=400, seed=71)
    sampler = QuerySampler(kg, seed=2)
    qs = sampler.sample_queries("2-inter", 8, n_neg=2)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < 8:
        q = sampler.sample_query("2-inter", n_neg=2)
        if q and q.formula == f:
            qs.append(q)
    b = make_dense_batch(f, qs[:8], batch_size=8, n_neg=2)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=3, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    sb = dense_to_sparse(b, n_rels=cfg.n_rels)

    want = np.asarray(mpqe_mod.encode_sparse(
        params, cfg, "2-inter",
        jnp.asarray(sb.node_entity), jnp.asarray(sb.node_mode),
        jnp.asarray(sb.node_is_var),
        jnp.asarray(sb.edges.src), jnp.asarray(sb.edges.dst),
        jnp.asarray(sb.edges.rel), jnp.asarray(sb.edges.norm),
        jnp.asarray(sb.node_query), jnp.asarray(sb.target_node),
        n_queries=8))

    bk = prb.bucket_edges_blocked(sb.edges, node_block=16, chunk=8)
    got = np.asarray(mpqe_mod.encode_sparse_blocked(
        params, cfg, "2-inter",
        jnp.asarray(sb.node_entity), jnp.asarray(sb.node_mode),
        jnp.asarray(sb.node_is_var), bk,
        jnp.asarray(sb.node_query), jnp.asarray(sb.target_node),
        n_queries=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_sparse_occupancy_rejected():
    """Graphs too sparse for the block layout (pad explosion) are
    rejected with guidance instead of silently burning memory."""
    rng = np.random.default_rng(5)
    st = _graph(rng, n_nodes=4096, n_e=100)  # ~0 edges per (128,128) tile
    with pytest.raises(ValueError, match="pad"):
        prb.bucket_edges_blocked(st, node_block=128, chunk=64)


def test_full_weight_model_rejected():
    st = _graph(np.random.default_rng(0))
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(0), D, D, N_RELS, None)
    bk = prb.bucket_edges_blocked(st, node_block=32, chunk=16)
    with pytest.raises(ValueError):
        prb.rgcn_sparse_blocked(
            jnp.zeros((st.n_nodes, D)), p, bk, N_RELS, interpret=True)
