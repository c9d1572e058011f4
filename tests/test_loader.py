"""Loaders: npz round-trip, query tuple round-trip, GQE pickle graph parse,
one-new-edge split."""

import pickle

import numpy as np
import pytest

from mpqe_tpu.data import loader as loader_mod
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=80, n_modes=3, n_base_rels=4,
                          n_triples=600, seed=13)


def test_kg_npz_roundtrip(tmp_path, kg):
    path = str(tmp_path / "kg.npz")
    loader_mod.save_kg_npz(path, kg)
    kg2 = loader_mod.load_kg_npz(path)
    assert kg2.n_entities == kg.n_entities
    assert kg2.n_base_rels == kg.n_base_rels
    np.testing.assert_array_equal(kg2.entity_mode, kg.entity_mode)
    a = np.stack([kg.heads, kg.rels, kg.tails], 1)
    b = np.stack([kg2.heads, kg2.rels, kg2.tails], 1)
    np.testing.assert_array_equal(np.sort(a, axis=0), np.sort(b, axis=0))


def test_query_tuple_roundtrip(tmp_path, kg):
    sampler = QuerySampler(kg, seed=1)
    qs = sampler.sample_queries("3-inter_chain", 10, n_neg=4)
    path = str(tmp_path / "q.pkl")
    loader_mod.save_queries_pickle(path, qs)
    grouped = loader_mod.load_queries_pickle(path, kg)
    back = [q for by_f in grouped.values() for qs2 in by_f.values() for q in qs2]
    assert len(back) == len(qs)
    orig = {(q.anchors, q.target, q.formula.rels) for q in qs}
    got = {(q.anchors, q.target, q.formula.rels) for q in back}
    assert orig == got
    # relation order is target-first on disk, anchor-first in memory
    t = loader_mod.query_to_tuple(qs[0])
    assert tuple(reversed(t[1])) == qs[0].formula.rels


def test_gqe_graph_pickle_parse(tmp_path):
    """Build a tiny graph_data.pkl in the GQE format (SURVEY.md §A.3)."""
    relations = {
        "person": [("paper", "writes")],
        "paper": [("person", "writes")],
    }
    adj_lists = {
        ("person", "writes", "paper"): {0: {2, 3}, 1: {3}},
        ("paper", "writes", "person"): {2: {0}, 3: {0, 1}},
    }
    node_maps = {"person": [0, 1], "paper": [2, 3]}
    path = str(tmp_path / "graph_data.pkl")
    with open(path, "wb") as f:
        pickle.dump((relations, adj_lists, node_maps), f)

    kg, mode_to_id, rel_to_id = loader_mod.load_graph_pickle(path)
    assert kg.n_entities == 4
    assert kg.n_modes == 2
    # forward + reverse adj_lists keys collapse into base relations
    assert ("person", "writes", "paper") in rel_to_id
    assert ("paper", "writes", "person") in rel_to_id
    f_id = rel_to_id[("person", "writes", "paper")]
    r_id = rel_to_id[("paper", "writes", "person")]
    assert f_id // 2 == r_id // 2 and f_id != r_id
    # person 0 writes papers 2,3 via some directed relation
    some = kg.neighbors(f_id, 0).tolist()
    assert set(some) == {2, 3} or set(kg.neighbors(r_id, 0).tolist()) == {2, 3}


def test_graph_and_queries_pickle_roundtrip_rel_ids(tmp_path):
    """Graph+queries export must stay consistent across a save/load round
    trip even when lexicographic relation-name order permutes base ids
    ('rel10' sorts before 'rel2') and flips forward/inverse direction
    (range-mode name sorting before domain-mode name) — the ADVICE.md
    round-trip bug: 20/24 directed ids changed edge sets before the fix."""
    kg = make_random_kg(n_entities=120, n_modes=3, n_base_rels=12,
                        n_triples=900, seed=7)
    d = tmp_path
    rel_map = loader_mod.save_graph_pickle(str(d / "graph_data.pkl"), kg)
    assert rel_map.shape == (2 * kg.n_base_rels,)
    # the map is a permutation of the directed vocabulary
    assert sorted(rel_map.tolist()) == list(range(2 * kg.n_base_rels))

    sampler = QuerySampler(kg, seed=3)
    qs = (sampler.sample_queries("2-chain", 25, n_neg=4)
          + sampler.sample_queries("2-inter", 25, n_neg=4))
    loader_mod.save_queries_pickle(str(d / "q.pkl"), qs, rel_id_map=rel_map)

    kg2, _, _ = loader_mod.load_graph_pickle(str(d / "graph_data.pkl"))
    grouped = loader_mod.load_queries_pickle(str(d / "q.pkl"), kg2)
    back = [q for by_f in grouped.values() for v in by_f.values() for q in v]
    assert len(back) == len(qs)
    # every reloaded query must bind real KG edges: each bound template
    # edge (anchor/target endpoints) exists in the reloaded graph
    for q in back:
        spec = q.formula.spec
        ent = {s: q.anchors[i] for i, s in enumerate(spec.anchor_slots)}
        ent[spec.target_slot] = q.target
        for j in range(spec.n_edges):
            s_slot, d_slot = spec.edge_src[j], spec.edge_dst[j]
            if s_slot in ent and d_slot in ent:
                nbrs = kg2.neighbors(q.formula.rels[j], ent[s_slot]).tolist()
                assert ent[d_slot] in nbrs, (
                    "query edge lost after round trip: directed rel ids "
                    "inconsistent between graph and query pickles"
                )
    # and every directed relation's edge set is preserved under the map
    for r_old in range(2 * kg.n_base_rels):
        r_new = int(rel_map[r_old])
        for h in range(0, kg.n_entities, 7):
            np.testing.assert_array_equal(
                np.sort(kg.neighbors(r_old, h)),
                np.sort(kg2.neighbors(r_new, h)),
            )


def test_split_one_new_edge(kg):
    sampler = QuerySampler(kg, seed=2)
    qs = sampler.sample_queries("1-chain", 20, n_neg=2)
    seen, new = loader_mod.split_one_new_edge(qs, kg)
    # all sampled from the same KG -> every edge seen
    assert len(seen) == 20 and len(new) == 0
    # corrupt a query's relation to fabricate an unseen edge
    import dataclasses as dc
    q = qs[0]
    bad_rel = (q.formula.rels[0] + 2) % kg.n_rels
    f2 = dc.replace(q.formula, rels=(bad_rel,))
    q2 = dc.replace(q, formula=f2)
    if q.target not in kg.neighbors(bad_rel, q.anchors[0]).tolist():
        seen2, new2 = loader_mod.split_one_new_edge([q2], kg)
        assert len(new2) == 1


def test_load_test_queries_split(tmp_path, kg):
    import dataclasses as dc
    sampler = QuerySampler(kg, seed=5)
    qs = sampler.sample_queries("2-chain", 12, n_neg=4)
    # corrupt some queries' first relation to force unseen edges
    bad = []
    for q in qs[:4]:
        r2 = (q.formula.rels[0] + 2) % kg.n_rels
        if q.target and q.anchors[0] is not None:
            f2 = dc.replace(q.formula, rels=(r2, q.formula.rels[1]))
            bad.append(dc.replace(q, formula=f2))
    path = str(tmp_path / "tq.pkl")
    loader_mod.save_queries_pickle(path, qs[4:] + bad)
    out = loader_mod.load_test_queries_pickle(path, kg, kg)
    n_full = sum(len(v) for bf in out["full_neg"].values() for v in bf.values())
    n_new = sum(len(v) for bf in out["one_new_edge"].values() for v in bf.values())
    assert n_full + n_new == len(qs[4:] + bad)
    assert n_full >= 8  # genuine queries have all edges present
