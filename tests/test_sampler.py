"""Query sampler: satisfiability, answers, negatives, hard negatives."""

import numpy as np
import pytest

from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.queries import STRUCTURES, INTERSECTION_STRUCTURES


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=120, n_modes=3, n_base_rels=4,
                          n_triples=1500, seed=1)


@pytest.mark.parametrize("structure", sorted(STRUCTURES))
def test_sampled_query_is_satisfiable(kg, structure):
    sampler = QuerySampler(kg, seed=7)
    qs = sampler.sample_queries(structure, 5, n_neg=8)
    spec = STRUCTURES[structure]
    for q in qs:
        assert q.formula.structure == structure
        assert len(q.anchors) == spec.n_anchors
        answers, _ = sampler.evaluate(q.formula, q.anchors)
        assert q.target in answers
        # negatives are same-mode non-answers
        t_mode = kg.entity_mode[q.target]
        for n in q.neg_samples:
            assert n not in answers
            assert kg.entity_mode[n] == t_mode
        # anchor modes recorded correctly
        for a_i, slot in enumerate(spec.anchor_slots):
            assert q.formula.node_modes[slot] == kg.entity_mode[q.anchors[a_i]]


@pytest.mark.parametrize("structure", sorted(INTERSECTION_STRUCTURES))
def test_hard_negatives_satisfy_some_but_not_all(kg, structure):
    sampler = QuerySampler(kg, seed=11)
    found_hard = 0
    for _ in range(20):
        q = sampler.sample_query(structure, n_neg=4, n_hard_neg=8)
        if q is None or not q.hard_neg_samples:
            continue
        found_hard += 1
        answers, per_conjunct = sampler.evaluate(q.formula, q.anchors)
        assert per_conjunct, "intersection query must expose conjunct sets"
        union = set().union(*per_conjunct)
        for h in q.hard_neg_samples:
            assert h in union and h not in answers
    assert found_hard > 0, "no hard negatives produced in 20 samples"


def test_kg_neighbors_consistent(kg):
    src, rel, dst = kg.directed_edges()
    # spot-check CSR neighbors against the raw edge list
    rng = np.random.default_rng(0)
    for _ in range(20):
        i = rng.integers(len(src))
        ns = kg.neighbors(int(rel[i]), int(src[i]))
        assert int(dst[i]) in ns.tolist()
