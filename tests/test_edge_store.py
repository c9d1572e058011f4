"""EdgeStore invariants: relation sort, CSR pointers, padding, normalizers."""

import numpy as np
import pytest

from mpqe_tpu.ops.edge_store import (
    build_edge_store,
    compute_edge_norm,
    coo_roundtrip_check,
)


def random_edges(rng, n_e, n_nodes, n_rels):
    return (
        rng.integers(0, n_nodes, n_e).astype(np.int32),
        rng.integers(0, n_nodes, n_e).astype(np.int32),
        rng.integers(0, n_rels, n_e).astype(np.int32),
    )


def test_sorted_and_csr(rng):
    src, dst, rel = random_edges(rng, 500, 40, 7)
    st = build_edge_store(src, dst, rel, n_nodes=40, n_rels=7)
    assert coo_roundtrip_check(st)
    assert st.capacity == 500 and st.n_edges == 500
    # multiset of edges preserved
    orig = sorted(zip(src.tolist(), dst.tolist(), rel.tolist()))
    got = sorted(zip(st.src.tolist(), st.dst.tolist(), st.rel.tolist()))
    assert orig == got
    # rel_ptr covers all
    assert st.rel_ptr[0] == 0
    assert st.rel_ptr[7] == 500
    assert st.rel_ptr[8] == 500


def test_padding(rng):
    src, dst, rel = random_edges(rng, 10, 8, 3)
    st = build_edge_store(src, dst, rel, n_nodes=8, n_rels=3, capacity=32)
    assert st.capacity == 32
    assert st.pad_mask.sum() == 10
    assert np.all(st.rel[10:] == 3)
    assert np.all(st.src[10:] == 8)
    assert np.all(st.norm[10:] == 0.0)
    assert coo_roundtrip_check(st)
    with pytest.raises(ValueError):
        build_edge_store(src, dst, rel, n_nodes=8, n_rels=3, capacity=5)


def test_norm_is_inverse_indegree_per_relation():
    # node 0 receives rel 0 twice and rel 1 once
    src = np.array([1, 2, 3], dtype=np.int32)
    dst = np.array([0, 0, 0], dtype=np.int32)
    rel = np.array([0, 0, 1], dtype=np.int32)
    norm = compute_edge_norm(dst, rel, n_nodes=4, n_rels=2)
    np.testing.assert_allclose(norm, [0.5, 0.5, 1.0])
    st = build_edge_store(src, dst, rel, n_nodes=4, n_rels=2)
    # after sorting, rel-0 edges first with norm 0.5 each
    np.testing.assert_allclose(st.norm, [0.5, 0.5, 1.0])
