"""C++ host runtime vs. the Python reference implementations."""

import numpy as np
import pytest

from mpqe_tpu.data import native
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.data.store import build_formula_store, pack_dense_batch_np
from mpqe_tpu.ops.edge_store import build_edge_store, coo_roundtrip_check
from mpqe_tpu.queries import STRUCTURES

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="C++ host library not buildable"
)


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=100, n_modes=3, n_base_rels=4,
                          n_triples=700, seed=23)


@pytest.fixture(scope="module")
def fstore(kg):
    sampler = QuerySampler(kg, seed=6)
    qs = sampler.sample_queries("3-inter_chain", 30, n_neg=8, n_hard_neg=8)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f]
    while len(qs) < 20:
        q = sampler.sample_query("3-inter_chain", n_neg=8)
        if q and q.formula == f:
            qs.append(q)
    return build_formula_store(f, qs[:20])


def test_pack_dense_batch_matches_python(fstore):
    pick = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
    nb = native.pack_dense_batch_native(fstore, pick, 16, 4, seed=7)
    pb = pack_dense_batch_np(fstore, pick, 16, 4, seed=7)
    # deterministic fields must match exactly (RNG streams differ, so
    # negatives may differ in choice but must come from the right pools)
    np.testing.assert_array_equal(nb.node_entity, pb.node_entity)
    np.testing.assert_array_equal(nb.node_mode, pb.node_mode)
    np.testing.assert_array_equal(nb.target, pb.target)
    np.testing.assert_array_equal(nb.query_mask, pb.query_mask)
    np.testing.assert_array_equal(nb.neg_mask, pb.neg_mask)
    np.testing.assert_array_equal(nb.edge_rel, pb.edge_rel)
    np.testing.assert_allclose(nb.edge_norm, pb.edge_norm)
    for b, qi in enumerate(pick):
        pool = set(fstore.neg_pool[fstore.neg_ptr[qi]:fstore.neg_ptr[qi+1]])
        assert set(nb.negatives[b]) <= pool
    # padding rows replicate row 0
    np.testing.assert_array_equal(nb.node_entity[8:], np.tile(nb.node_entity[0], (8, 1)))


def test_pack_hard_negatives(fstore):
    pick = np.arange(10, dtype=np.int64)
    nb = native.pack_dense_batch_native(fstore, pick, 16, 4, seed=3,
                                        use_hard=True)
    for b, qi in enumerate(pick):
        hpool = set(fstore.hard_pool[fstore.hard_ptr[qi]:fstore.hard_ptr[qi+1]])
        npool = set(fstore.neg_pool[fstore.neg_ptr[qi]:fstore.neg_ptr[qi+1]])
        assert set(nb.negatives[b]) <= (hpool if hpool else npool)


def test_edge_store_native_matches_python(rng):
    src = rng.integers(0, 50, 300).astype(np.int32)
    dst = rng.integers(0, 50, 300).astype(np.int32)
    rel = rng.integers(0, 7, 300).astype(np.int32)
    a = build_edge_store(src, dst, rel, 50, 7, capacity=320)
    b = native.build_edge_store_native(src, dst, rel, 50, 7, capacity=320)
    assert coo_roundtrip_check(b)
    np.testing.assert_array_equal(a.rel_ptr, b.rel_ptr)
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.dst, b.dst)
    np.testing.assert_array_equal(a.rel, b.rel)
    np.testing.assert_allclose(a.norm, b.norm)


def test_synthetic_kg_native():
    kg = native.make_synthetic_kg_native(1000, 4, 6, 5000, seed=1)
    kg.validate()
    assert kg.n_entities == 1000 and kg.n_triples == 5000
    # schema respected
    np.testing.assert_array_equal(
        kg.entity_mode[kg.heads], kg.rel_domain[kg.rels])
    np.testing.assert_array_equal(
        kg.entity_mode[kg.tails], kg.rel_range[kg.rels])
    # contiguous modes
    assert np.all(np.diff(kg.entity_mode) >= 0)


@pytest.mark.parametrize("structure", ["1-chain", "3-chain", "3-chain_inter"])
def test_native_sampler_queries_are_satisfiable(structure):
    kg = native.make_synthetic_kg_native(500, 3, 5, 4000, seed=2)
    out = native.sample_queries_native(kg, structure, 50, n_neg=4, seed=5)
    spec = STRUCTURES[structure]
    ents, rels = out["entities"], out["rels"]
    ok = ents[:, 0] >= 0
    assert ok.sum() >= 40
    # verify each sampled edge exists in the KG
    for q in np.where(ok)[0][:20]:
        for j in range(spec.n_edges):
            s_e = ents[q, spec.edge_src[j]]
            d_e = ents[q, spec.edge_dst[j]]
            r = rels[q, j]
            assert d_e in kg.neighbors(r, s_e).tolist(), (q, j)
        tm = kg.entity_mode[ents[q, spec.target_slot]]
        for c in out["negatives"][q]:
            assert kg.entity_mode[c] == tm
            assert c != ents[q, spec.target_slot]


def test_native_batch_packing_speed(fstore):
    """Native packer must beat the Python packer (sanity, not a bench)."""
    import time
    pick = np.arange(20, dtype=np.int64)
    t0 = time.perf_counter()
    for i in range(50):
        native.pack_dense_batch_native(fstore, pick, 512, 4, seed=i)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(50):
        pack_dense_batch_np(fstore, pick, 512, 4, seed=i)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)


def test_pack_on_the_fly_fallback_negatives(kg):
    """Queries with EMPTY neg_samples draw uniform same-mode negatives
    from the shared fallback pool at pack time (no materialized per-query
    pools) — numpy and C++ packers share the contract: negatives come
    from the pool, never equal the target, masks set."""
    import dataclasses

    sampler = QuerySampler(kg, seed=31)
    qs = sampler.sample_queries("1-chain", 25, n_neg=4)
    f = qs[0].formula
    qs = [q for q in qs if q.formula == f][:12]
    qs = [dataclasses.replace(q, neg_samples=()) if hasattr(q, "neg_samples")
          else q for q in qs]
    fb = kg.entities_of_mode(f.target_mode)
    store = build_formula_store(f, qs, fallback_pool=fb)
    assert store.neg_pool.size == 0 and store.fallback_pool is not None

    pick = np.arange(len(qs), dtype=np.int64)
    pool = set(int(x) for x in fb)
    for packer in (pack_dense_batch_np, native.pack_dense_batch_native):
        b = packer(store, pick, 16, 4, seed=5)
        n = len(qs)
        assert np.all(b.neg_mask[:n] == 1.0)
        for i in range(n):
            assert set(int(x) for x in b.negatives[i]) <= pool
            assert int(b.target[i]) not in set(int(x) for x in b.negatives[i])

    # hard-negative packing falls through the same chain (hard -> neg ->
    # fallback)
    bh = native.pack_dense_batch_native(store, pick, 16, 4, seed=5,
                                        use_hard=True)
    assert np.all(bh.neg_mask[: len(qs)] == 1.0)
