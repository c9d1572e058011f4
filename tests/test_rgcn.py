"""R-GCN compute cores: dense template vs sparse vs relblock vs NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.ops.edge_store import build_edge_store
from mpqe_tpu.utils import oracle

D = 16
N_RELS = 6


def _params(key, num_bases):
    return rgcn_ops.init_rgcn_layer(key, D, D, N_RELS, num_bases=num_bases)


def _np_params(p):
    return {k: np.asarray(v) for k, v in p.items()}


@pytest.mark.parametrize("num_bases", [None, 3])
def test_sparse_matches_oracle(rng, num_bases):
    p = _params(jax.random.PRNGKey(0), num_bases)
    n_nodes, n_e = 30, 120
    x = rng.normal(size=(n_nodes, D)).astype(np.float32)
    src = rng.integers(0, n_nodes, n_e).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_e).astype(np.int32)
    rel = rng.integers(0, N_RELS, n_e).astype(np.int32)
    st = build_edge_store(src, dst, rel, n_nodes, N_RELS, capacity=160)

    got = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel, jnp.asarray(st.norm), N_RELS
        )
    )
    want = oracle.rgcn_layer_np(
        x, _np_params(p), st.src, st.dst, st.rel, st.norm, N_RELS
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    got2 = np.asarray(
        rgcn_ops.rgcn_sparse_relblock(
            jnp.asarray(x), p, st.src, st.dst, st.rel, jnp.asarray(st.norm), N_RELS
        )
    )
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("num_bases", [None, 3])
def test_dense_template_matches_sparse(rng, num_bases):
    """B copies of a 3-chain_inter template: dense path == flattened sparse."""
    p = _params(jax.random.PRNGKey(1), num_bases)
    B, n = 8, 4
    edge_src, edge_dst = (0, 1, 2), (2, 2, 3)
    edge_rel = np.array([2, 5, 1], dtype=np.int32)
    edge_norm = np.array([1.0, 1.0, 1.0], dtype=np.float32)
    x = rng.normal(size=(B, n, D)).astype(np.float32)

    got = np.asarray(
        rgcn_ops.rgcn_dense_template(
            jnp.asarray(x), p, edge_src, edge_dst,
            jnp.asarray(edge_rel), jnp.asarray(edge_norm),
        )
    )

    # flatten to one big graph
    offs = np.arange(B)[:, None] * n
    f_src = (offs + np.array(edge_src)[None]).reshape(-1).astype(np.int32)
    f_dst = (offs + np.array(edge_dst)[None]).reshape(-1).astype(np.int32)
    f_rel = np.tile(edge_rel, B)
    f_norm = np.tile(edge_norm, B)
    want = oracle.rgcn_layer_np(
        x.reshape(B * n, D), _np_params(p), f_src, f_dst, f_rel, f_norm, N_RELS
    ).reshape(B, n, D)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dense_template_norm_applies():
    """2-inter with equal relations: both edges into target get norm 1/2."""
    p = _params(jax.random.PRNGKey(2), None)
    B, n = 2, 3
    x = np.ones((B, n, D), dtype=np.float32)
    edge_src, edge_dst = (0, 1), (2, 2)
    rel_same = jnp.asarray(np.array([4, 4], dtype=np.int32))
    half = jnp.asarray(np.array([0.5, 0.5], dtype=np.float32))
    one = jnp.asarray(np.array([1.0, 1.0], dtype=np.float32))
    out_half = np.asarray(
        rgcn_ops.rgcn_dense_template(jnp.asarray(x), p, edge_src, edge_dst, rel_same, half)
    )
    out_one = np.asarray(
        rgcn_ops.rgcn_dense_template(jnp.asarray(x), p, edge_src, edge_dst, rel_same, one)
    )
    base = np.asarray(
        jnp.dot(jnp.asarray(x[:, 2]), p["w_self"]) + p["bias"]
    )
    np.testing.assert_allclose(
        out_one[:, 2] - base, 2 * (out_half[:, 2] - base), rtol=1e-4, atol=1e-5
    )


def test_padded_edges_are_ignored(rng):
    p = _params(jax.random.PRNGKey(3), 2)
    n_nodes = 10
    x = rng.normal(size=(n_nodes, D)).astype(np.float32)
    src = rng.integers(0, n_nodes, 20).astype(np.int32)
    dst = rng.integers(0, n_nodes, 20).astype(np.int32)
    rel = rng.integers(0, N_RELS, 20).astype(np.int32)
    st_tight = build_edge_store(src, dst, rel, n_nodes, N_RELS)
    st_padded = build_edge_store(src, dst, rel, n_nodes, N_RELS, capacity=64)
    a = np.asarray(
        rgcn_ops.rgcn_sparse(jnp.asarray(x), p, st_tight.src, st_tight.dst,
                             st_tight.rel, jnp.asarray(st_tight.norm), N_RELS)
    )
    b = np.asarray(
        rgcn_ops.rgcn_sparse(jnp.asarray(x), p, st_padded.src, st_padded.dst,
                             st_padded.rel, jnp.asarray(st_padded.norm), N_RELS)
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
