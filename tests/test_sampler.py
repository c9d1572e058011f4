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


def test_make_rule_kg_deterministic_structure():
    """Rule KG: relations are out_degree-regular deterministic maps within
    the mode schema; regenerating with the same seed is identical."""
    from mpqe_tpu.data.sampler import make_rule_kg

    kg = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                      out_degree=2, seed=3)
    kg2 = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                       out_degree=2, seed=3)
    np.testing.assert_array_equal(kg.heads, kg2.heads)
    np.testing.assert_array_equal(kg.tails, kg2.tails)
    for r in range(kg.n_base_rels):
        dom = np.where(kg.entity_mode == kg.rel_domain[r])[0]
        rng_mode = int(kg.rel_range[r])
        degs = []
        for h in dom[:20]:
            nbrs = kg.neighbors(2 * r, int(h))
            degs.append(len(nbrs))
            assert all(kg.entity_mode[t] == rng_mode for t in nbrs)
        # out_degree-regular (distinct shifts can collide only if equal,
        # which rng.choice-free sampling may allow; degree is 1..out_degree)
        assert all(1 <= d <= 2 for d in degs)


def test_make_rule_kg_variants():
    """The warp/band rule families (VERDICT r2 item 4 substrates): warp =
    piecewise translations (parity-dependent shift); band = many-to-many
    row/column relations whose range-sharing pairs are crossed (their
    2-inter pins a single cell)."""
    from mpqe_tpu.data.sampler import make_rule_kg

    g = 10  # 300 entities / 3 modes = 100 = g*g
    warp = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                        out_degree=2, seed=3, variant="warp")
    # out_degree piecewise branches + 1 plain shift -> degree <= 3
    for r in range(warp.n_base_rels):
        dom = np.where(warp.entity_mode == warp.rel_domain[r])[0]
        for h in dom[:10]:
            assert 1 <= len(warp.neighbors(2 * r, int(h))) <= 3

    band = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                        seed=3, variant="band")
    per_mode = 100
    for r in range(band.n_base_rels):
        dom = np.where(band.entity_mode == band.rel_domain[r])[0]
        # whole-line images: out-degree g
        tails0 = band.neighbors(2 * r, int(dom[0]))
        assert len(tails0) == g
        # crossed pair (r, r+3) shares the range mode; a column and a row
        # intersect in exactly one cell
        other = (r + 3) % 6
        if int(band.rel_range[r]) == int(band.rel_range[other]):
            dom2 = np.where(band.entity_mode == band.rel_domain[other])[0]
            tails1 = band.neighbors(2 * other, int(dom2[0]))
            inter = set(map(int, tails0)) & set(map(int, tails1))
            assert len(inter) == 1, (r, other, len(inter))

    noisy = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                         out_degree=2, seed=3, noise=0.2)
    clean = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                         out_degree=2, seed=3, noise=0.0)
    both = set(map(tuple, np.stack(
        [noisy.heads, noisy.rels, noisy.tails], 1).tolist()))
    ref = set(map(tuple, np.stack(
        [clean.heads, clean.rels, clean.tails], 1).tolist()))
    frac_changed = 1 - len(both & ref) / len(ref)
    assert 0.05 < frac_changed < 0.4  # ~20% rewired


def test_all_edge_queries_cover_every_directed_edge(kg):
    """all_edge_queries = the reference train_edges.pkl protocol: exactly
    one 1-chain query per directed KG edge, with valid negatives."""
    s = QuerySampler(kg, seed=2)
    qs = s.all_edge_queries(n_neg=4)
    src, rel, dst = kg.directed_edges()
    want = sorted(zip(src.tolist(), rel.tolist(), dst.tolist()))
    got = sorted((q.anchors[0], q.formula.rels[0], q.target) for q in qs)
    assert got == want
    for q in qs[:50]:
        answers = set(kg.neighbors(q.formula.rels[0], q.anchors[0]).tolist())
        assert q.target in answers
        assert all(n not in answers for n in q.neg_samples)
        # negatives share the target's mode
        t_mode = kg.entity_mode[q.target]
        assert all(kg.entity_mode[n] == t_mode for n in q.neg_samples)


def test_make_rule_kg_band_seg():
    """band_seg = band's set-valued character at BOUNDED out-degree
    (seg_width): column/row SEGMENT images, so edges scale as
    O(entities * seg_width) instead of band's g^3 — the AM-scale
    substrate (round-4 VERDICT item 3)."""
    from mpqe_tpu.data.sampler import make_rule_kg

    g, w = 10, 4
    kg = make_rule_kg(n_entities=300, n_modes=3, n_base_rels=6,
                      seed=3, variant="band_seg", seg_width=w)
    per_mode = g * g
    # bounded out-degree w everywhere
    for r in range(kg.n_base_rels):
        dom = np.where(kg.entity_mode == kg.rel_domain[r])[0]
        for h in dom[:5]:
            assert len(kg.neighbors(2 * r, int(h))) == w
    # edge count scales as per_mode * w per base relation
    assert kg.n_triples == 6 * per_mode * w
    # crossed range-sharing pair: column segment x row segment intersect
    # in at most w cells (generically ~1)
    for r in range(6):
        other = (r + 3) % 6
        if int(kg.rel_range[r]) != int(kg.rel_range[other]):
            continue
        dom_r = np.where(kg.entity_mode == kg.rel_domain[r])[0]
        dom_o = np.where(kg.entity_mode == kg.rel_domain[other])[0]
        t0 = set(map(int, kg.neighbors(2 * r, int(dom_r[0]))))
        t1 = set(map(int, kg.neighbors(2 * other, int(dom_o[0]))))
        assert len(t0 & t1) <= w
