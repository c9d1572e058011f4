"""Fused Pallas R-GCN kernel (v2) vs the XLA sparse path (interpreter mode
on CPU; compiled-mode parity runs on TPU via tools/tpu_smoke.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import pallas_rgcn as pr
from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.ops.edge_store import build_edge_store

D = 16
N_RELS = 6


def _graph(rng, n_nodes=50, n_e=200):
    src = rng.integers(0, n_nodes, n_e).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_e).astype(np.int32)
    rel = rng.integers(0, N_RELS, n_e).astype(np.int32)
    return build_edge_store(src, dst, rel, n_nodes, N_RELS)


def test_chunk_by_relation_invariants(rng):
    st = _graph(rng)
    ch = pr.chunk_by_relation(st, chunk=32)
    n_chunks = len(ch["chunk_rel"])
    assert len(ch["src"]) == n_chunks * 32
    # every chunk single-relation; padded edges have norm 0 and pad node
    rel_e = np.repeat(ch["chunk_rel"], 32)
    for c in range(n_chunks):
        sl = slice(c * 32, (c + 1) * 32)
        pad = ch["norm"][sl] == 0.0
        assert np.all(ch["src"][sl][pad] == st.n_nodes)
    # real edges preserved
    m = st.pad_mask
    orig = sorted(zip(st.src[m], st.dst[m], st.rel[m]))
    realm2 = ch["src"] != st.n_nodes
    got2 = sorted(zip(ch["src"][realm2], ch["dst"][realm2], rel_e[realm2]))
    assert got2 == orig


@pytest.mark.parametrize("num_bases", [3, None])
def test_fused_matches_sparse(rng, num_bases):
    st = _graph(rng)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(0), D, D, N_RELS, num_bases)
    x = rng.normal(size=(st.n_nodes, D)).astype(np.float32)
    want = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel,
            jnp.asarray(st.norm), N_RELS,
        )
    )
    ch = pr.chunk_by_relation(st, chunk=32)
    got = np.asarray(
        pr.rgcn_sparse_fused(jnp.asarray(x), p, ch, N_RELS, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_edge_messages_match_xla_oracle(rng):
    st = _graph(rng)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(3), D, D, N_RELS, 3)
    x = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    ch = pr.chunk_by_relation(st, chunk=32)
    src = jnp.asarray(ch["src"])
    norm = jnp.asarray(ch["norm"])
    crel = jnp.asarray(ch["chunk_rel"])
    got = np.asarray(pr.rgcn_edge_messages(
        x, p["basis"], p["coeff"], src, norm, N_RELS, 32, True, crel))
    want = np.asarray(pr._edge_messages_xla(
        x, p["basis"], p["coeff"], src, norm, crel, N_RELS, 32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("num_bases", [3, None])
def test_fused_layer_gradients_match_xla(rng, num_bases):
    """Full-layer grads (x + every param) through the custom VJP must match
    the composable XLA path."""
    st = _graph(rng, n_nodes=30, n_e=100)
    p = rgcn_ops.init_rgcn_layer(
        jax.random.PRNGKey(1), D, D, N_RELS, num_bases)
    x = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    ch = pr.chunk_by_relation(st, chunk=32)

    def loss_fused(x, p):
        out = pr.rgcn_sparse_fused(x, p, ch, N_RELS, interpret=True)
        return jnp.sum(out**2)

    def loss_xla(x, p):
        out = rgcn_ops.rgcn_sparse(
            x, p, jnp.asarray(st.src), jnp.asarray(st.dst),
            jnp.asarray(st.rel), jnp.asarray(st.norm), N_RELS,
        )
        return jnp.sum(out**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_no_node_cap(rng):
    """v2 streams node rows from HBM: node counts far beyond the old
    8192-row VMEM cap must work (interpret mode, small d)."""
    n_nodes = 20_000
    st = _graph(rng, n_nodes=n_nodes, n_e=300)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(2), D, D, N_RELS, 3)
    x = rng.normal(size=(n_nodes, D)).astype(np.float32)
    ch = pr.chunk_by_relation(st, chunk=32)
    got = np.asarray(
        pr.rgcn_sparse_fused(jnp.asarray(x), p, ch, N_RELS, interpret=True))
    want = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel,
            jnp.asarray(st.norm), N_RELS,
        ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_big_basis_table_streams_from_hbm(rng):
    """A basis table over MAX_BASIS_VMEM_BYTES routes through the
    per-relation HBM-blocked kernel and still matches."""
    st = _graph(rng)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(4), D, D, N_RELS, 3)
    x = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    ch = pr.chunk_by_relation(st, chunk=32)
    want = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel,
            jnp.asarray(st.norm), N_RELS,
        ))
    old = pr.MAX_BASIS_VMEM_BYTES
    try:
        pr.MAX_BASIS_VMEM_BYTES = 0  # force the streaming path
        got = np.asarray(
            pr.rgcn_sparse_fused(x, p, ch, N_RELS, interpret=True))
    finally:
        pr.MAX_BASIS_VMEM_BYTES = old
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_training_through_fused_kernel_decreases_loss(rng):
    """A few Adam steps through rgcn_sparse_fused (custom VJP) reduce a
    margin-style loss — the kernel trains, not just evaluates."""
    import optax

    st = _graph(rng, n_nodes=40, n_e=160)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(5), D, D, N_RELS, 3)
    x0 = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))
    ch = pr.chunk_by_relation(st, chunk=32)
    tgt = jnp.asarray(rng.normal(size=(st.n_nodes, D)).astype(np.float32))

    def loss_fn(p):
        out = pr.rgcn_sparse_fused(x0, p, ch, N_RELS, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    opt = optax.adam(0.01)
    opt_state = opt.init(p)
    losses = []
    for _ in range(20):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, up)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_encode_sparse_fused_matches_encode_sparse(rng):
    """Full model forward through the fused kernel == XLA sparse path."""
    from mpqe_tpu.data.batcher import dense_to_sparse, make_dense_batch
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
    from mpqe_tpu.models import mpqe as mpqe_mod

    kg = make_random_kg(n_entities=60, n_modes=2, n_base_rels=3,
                        n_triples=400, seed=71)
    sampler = QuerySampler(kg, seed=2)
    qs = sampler.sample_queries("3-chain_inter", 8, n_neg=2)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < 8:
        q = sampler.sample_query("3-chain_inter", n_neg=2)
        if q and q.formula == f:
            qs.append(q)
    b = make_dense_batch(f, qs[:8], batch_size=8, n_neg=2)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=3, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    sb = dense_to_sparse(b, n_rels=cfg.n_rels)

    want = np.asarray(mpqe_mod.encode_sparse(
        params, cfg, "3-chain_inter",
        jnp.asarray(sb.node_entity), jnp.asarray(sb.node_mode),
        jnp.asarray(sb.node_is_var),
        jnp.asarray(sb.edges.src), jnp.asarray(sb.edges.dst),
        jnp.asarray(sb.edges.rel), jnp.asarray(sb.edges.norm),
        jnp.asarray(sb.node_query), jnp.asarray(sb.target_node),
        n_queries=8))

    ch = pr.chunk_by_relation(sb.edges, chunk=32)
    got = np.asarray(mpqe_mod.encode_sparse_fused(
        params, cfg, "3-chain_inter",
        jnp.asarray(sb.node_entity), jnp.asarray(sb.node_mode),
        jnp.asarray(sb.node_is_var), ch,
        jnp.asarray(sb.node_query), jnp.asarray(sb.target_node),
        n_queries=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
