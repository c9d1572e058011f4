"""Template invariants for the 7 canonical query structures (SURVEY.md §A.2)."""

import pytest

from mpqe_tpu.queries import (
    STRUCTURES,
    Formula,
    Query,
    group_queries_by_formula,
)

EXPECTED = {
    # name: (n_nodes, n_edges, diameter, n_anchors)
    "1-chain": (2, 1, 1, 1),
    "2-chain": (3, 2, 2, 1),
    "3-chain": (4, 3, 3, 1),
    "2-inter": (3, 2, 1, 2),
    "3-inter": (4, 3, 1, 3),
    "3-inter_chain": (4, 3, 2, 2),
    "3-chain_inter": (4, 3, 2, 2),
}


def test_all_seven_structures_present():
    # custom registrations (register_structure) may ADD entries within a
    # test process; the canonical 7 and their snapshot tuple are fixed
    assert set(EXPECTED) <= set(STRUCTURES)
    from mpqe_tpu.queries import STRUCTURE_NAMES

    assert set(STRUCTURE_NAMES) == set(EXPECTED)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_structure_shape(name):
    s = STRUCTURES[name]
    n_nodes, n_edges, diam, n_anchors = EXPECTED[name]
    assert s.n_nodes == n_nodes
    assert s.n_edges == n_edges
    assert s.diameter == diam
    assert s.n_anchors == n_anchors
    assert len(s.edge_src) == n_edges and len(s.edge_dst) == n_edges
    # slot conventions: anchors, then vars, target last; edges src < dst
    assert s.target_slot == s.n_nodes - 1
    assert set(s.anchor_slots) | set(s.var_slots) | {s.target_slot} == set(
        range(s.n_nodes)
    )
    for j in range(n_edges):
        assert s.edge_src[j] < s.edge_dst[j]
    # target has at least one incoming edge; every node except target has
    # at least one outgoing edge (everything flows toward the target)
    assert s.target_slot in s.edge_dst
    for node in range(s.n_nodes - 1):
        assert node in s.edge_src


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_diameter_is_longest_path_to_target(name):
    s = STRUCTURES[name]
    # longest path ending at target over the DAG
    depth = [0] * s.n_nodes
    for j in range(s.n_edges):  # edges sorted so src < dst -> topo order
        depth[s.edge_dst[j]] = max(depth[s.edge_dst[j]], depth[s.edge_src[j]] + 1)
    assert depth[s.target_slot] == s.diameter


def test_formula_validation():
    with pytest.raises(ValueError):
        Formula("2-chain", rels=(1,), node_modes=(0, 0, 0))
    with pytest.raises(ValueError):
        Formula("2-chain", rels=(1, 2), node_modes=(0, 0))
    f = Formula("2-chain", rels=(1, 2), node_modes=(0, 1, 2))
    assert f.target_mode == 2


def test_query_validation_and_grouping():
    f1 = Formula("2-inter", rels=(0, 2), node_modes=(0, 0, 1))
    f2 = Formula("2-inter", rels=(4, 2), node_modes=(0, 0, 1))
    with pytest.raises(ValueError):
        Query(f1, anchors=(3,), target=7)
    qs = [
        Query(f1, (1, 2), 9),
        Query(f2, (3, 4), 8),
        Query(f1, (5, 6), 7),
    ]
    g = group_queries_by_formula(qs)
    assert set(g) == {"2-inter"}
    assert len(g["2-inter"][f1]) == 2
    assert len(g["2-inter"][f2]) == 1
