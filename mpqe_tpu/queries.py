"""Query-DAG data model: the 7 canonical query structures, formulas, queries.

A *query* over a knowledge graph is a small DAG whose anchor nodes are bound
to KG entities and whose target node is the variable to answer.  The seven
canonical structures (chains of length 1-3 and three intersection shapes)
follow the GQE/MPQE lineage (reference: mpqe/graph.py `Formula`/`Query` and
the hard-coded query templates in mpqe/data_utils.py `RGCNQueryDataset`;
see SURVEY.md §A.2 — the reference mount was empty, so this is built from
the behavioral spec, not copied).

TPU-first design notes
----------------------
Unlike the reference (which builds a PyG edge_index per batch in Python),
structures here are *static templates*: fixed node-slot and edge-slot
layouts.  A batch of B same-structure queries is a dense ``[B, n_nodes]``
integer tensor problem — no per-batch graph construction, no dynamic
shapes, one XLA compilation per (structure, batch-size) bucket.

Node-slot convention (per structure): anchors first, then internal
variables, target LAST.  Edge slots are enumerated anchor-to-target;
``edge_rel_slot[j]`` says which entry of a formula's relation tuple labels
template edge ``j`` (here it is always ``j`` — the formula stores relations
in template-edge order; loaders converting from GQE's target-first nested
tuples must reorder, see data/loader.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class QueryStructure:
    """A static query-DAG template.

    Attributes:
      name: canonical structure name (e.g. ``"3-chain_inter"``).
      n_nodes: number of node slots.
      n_edges: number of edge slots.
      diameter: longest directed path length to the target (the number of
        message-passing steps needed for anchor information to reach the
        target; used by the TGT readout).
      anchor_slots: node slots bound to KG entities.
      var_slots: node slots that are existential variables (excludes target).
      target_slot: the answer node slot (always the last slot).
      edge_src / edge_dst: per edge slot, the source/destination node slot.
        Edges point *toward* the target.
    """

    name: str
    n_nodes: int
    n_edges: int
    diameter: int
    anchor_slots: Tuple[int, ...]
    var_slots: Tuple[int, ...]
    target_slot: int
    edge_src: Tuple[int, ...]
    edge_dst: Tuple[int, ...]

    @property
    def n_anchors(self) -> int:
        return len(self.anchor_slots)

    @property
    def free_slots(self) -> Tuple[int, ...]:
        """Variable slots plus the target slot (nodes not bound to entities)."""
        return self.var_slots + (self.target_slot,)


def _s(name, n_nodes, n_edges, diameter, anchors, variables, edges):
    src = tuple(e[0] for e in edges)
    dst = tuple(e[1] for e in edges)
    return QueryStructure(
        name=name,
        n_nodes=n_nodes,
        n_edges=n_edges,
        diameter=diameter,
        anchor_slots=tuple(anchors),
        var_slots=tuple(variables),
        target_slot=n_nodes - 1,
        edge_src=src,
        edge_dst=dst,
    )


# The 7 canonical structures (SURVEY.md §A.2).  Slot order:
# [anchors..., variables..., target].
STRUCTURES: Dict[str, QueryStructure] = {
    # a0 -r0-> t
    "1-chain": _s("1-chain", 2, 1, 1, [0], [], [(0, 1)]),
    # a0 -r0-> v0 -r1-> t
    "2-chain": _s("2-chain", 3, 2, 2, [0], [1], [(0, 1), (1, 2)]),
    # a0 -r0-> v0 -r1-> v1 -r2-> t
    "3-chain": _s("3-chain", 4, 3, 3, [0], [1, 2], [(0, 1), (1, 2), (2, 3)]),
    # a0 -r0-> t <-r1- a1
    "2-inter": _s("2-inter", 3, 2, 1, [0, 1], [], [(0, 2), (1, 2)]),
    # a0,a1,a2 -ri-> t
    "3-inter": _s("3-inter", 4, 3, 1, [0, 1, 2], [], [(0, 3), (1, 3), (2, 3)]),
    # a0 -r0-> t ; a1 -r1-> v0 -r2-> t
    "3-inter_chain": _s(
        "3-inter_chain", 4, 3, 2, [0, 1], [2], [(0, 3), (1, 2), (2, 3)]
    ),
    # a0 -r0-> v0 <-r1- a1 ; v0 -r2-> t
    "3-chain_inter": _s(
        "3-chain_inter", 4, 3, 2, [0, 1], [2], [(0, 2), (1, 2), (2, 3)]
    ),
}

STRUCTURE_NAMES: Tuple[str, ...] = tuple(STRUCTURES)

# Query "types" grouped by anchor arity, mirroring the reference's
# {train,val,test}_queries_{2,3}.pkl split (SURVEY.md §A.3).
CHAIN_STRUCTURES = ("1-chain", "2-chain", "3-chain")
# a SET (membership-checked only) so register_structure can extend it
# in place — from-imports across the package see the mutation
INTERSECTION_STRUCTURES = {
    "2-inter",
    "3-inter",
    "3-inter_chain",
    "3-chain_inter",
}


def register_structure(
    name: str,
    n_anchors: int,
    n_vars: int,
    edges: Sequence[Tuple[int, int]],
) -> QueryStructure:
    """Register a CUSTOM query-DAG template under ``name``.

    The reference hardcodes its 7 templates (SURVEY.md §2.1 batcher
    row); here templates are data, so a new DAG shape (a 4-chain, a
    deeper intersection tree, ...) gets the whole stack — sampler,
    C++/numpy batch packers, dense encoder, curriculum training, eval,
    serving — without touching any of it.  Slot convention: anchors are
    slots ``0..n_anchors-1``, variables follow, the target is LAST.

    Validated invariants (the ones the rest of the framework relies
    on):
      * every edge points toward the target: ``src < dst``, and no edge
        ends at an anchor slot;
      * iterating edges in REVERSE, each edge's destination is the
        target or was bound (as the source) by a later edge — the
        sampler's backward-walk requirement;
      * every slot participates in some edge.

    ``diameter`` (TGT readout depth) is computed as the longest path to
    the target.  Structures with a multi-in-edge node register as
    intersections (hard-negative protocol applies).
    """
    if name in STRUCTURES:
        raise ValueError(f"structure {name!r} already registered")
    n_nodes = n_anchors + n_vars + 1
    target = n_nodes - 1
    edges = [(int(s), int(d)) for s, d in edges]
    touched = set()
    for s, d in edges:
        if not (0 <= s < d < n_nodes):
            raise ValueError(
                f"edge ({s},{d}) must satisfy 0 <= src < dst < {n_nodes} "
                "(edges point toward the target)")
        if d < n_anchors:
            raise ValueError(f"edge ({s},{d}) ends at an anchor slot")
        touched.add(s)
        touched.add(d)
    if touched != set(range(n_nodes)):
        raise ValueError(
            f"disconnected slots: {sorted(set(range(n_nodes)) - touched)}")
    # every variable/target slot must be DEFINED by propagation — a
    # source-only variable slot passes the backward walk but crashes the
    # sampler's topological check later; reject it here instead
    in_slots = {d for _, d in edges}
    no_in = [i for i in range(n_anchors, n_nodes) if i not in in_slots]
    if no_in:
        raise ValueError(
            f"variable/target slots without an incoming edge: {no_in}")
    bound = {target}
    for s, d in reversed(edges):
        if d not in bound:
            raise ValueError(
                f"edge ({s},{d}): destination unbound in the backward "
                "walk — order edges anchor-to-target")
        bound.add(s)
    # diameter = longest path to target (src < dst => descending DP)
    dist = [0] * n_nodes
    for s, d in sorted(edges, key=lambda e: -e[1]):
        dist[s] = max(dist[s], dist[d] + 1)
    spec = _s(name, n_nodes, len(edges), max(dist),
              list(range(n_anchors)),
              list(range(n_anchors, n_nodes - 1)), edges)
    STRUCTURES[name] = spec
    in_deg: Dict[int, int] = {}
    for _, d in edges:
        in_deg[d] = in_deg.get(d, 0) + 1
    if any(v >= 2 for v in in_deg.values()):
        INTERSECTION_STRUCTURES.add(name)
    return spec


@dataclasses.dataclass(frozen=True)
class Formula:
    """A query structure with concrete relation labels and node modes.

    ``rels[j]`` is the (directed) relation id of template edge ``j``.
    ``node_modes[i]`` is the entity-mode id of node slot ``i`` — anchors use
    it for sanity checks; variable/target slots use it to pick the per-mode
    learned variable embedding (reference: mpqe model's variable embeddings,
    SURVEY.md §2.1 "Query-graph batcher").
    """

    structure: str
    rels: Tuple[int, ...]
    node_modes: Tuple[int, ...]

    def __post_init__(self):
        s = STRUCTURES[self.structure]
        if len(self.rels) != s.n_edges:
            raise ValueError(
                f"{self.structure}: expected {s.n_edges} relations, got {len(self.rels)}"
            )
        if len(self.node_modes) != s.n_nodes:
            raise ValueError(
                f"{self.structure}: expected {s.n_nodes} node modes, got {len(self.node_modes)}"
            )

    @property
    def spec(self) -> QueryStructure:
        return STRUCTURES[self.structure]

    @property
    def target_mode(self) -> int:
        return self.node_modes[self.spec.target_slot]


@dataclasses.dataclass(frozen=True)
class Query:
    """One query instance: a formula with bound anchors and a known answer.

    ``neg_samples`` are pre-sampled same-mode non-answers; ``hard_neg_samples``
    (intersection structures only) satisfy a strict subset of the conjuncts
    (reference: mpqe/graph.py Query; SURVEY.md §A.4).
    """

    formula: Formula
    anchors: Tuple[int, ...]
    target: int
    neg_samples: Tuple[int, ...] = ()
    hard_neg_samples: Tuple[int, ...] = ()

    def __post_init__(self):
        if len(self.anchors) != self.formula.spec.n_anchors:
            raise ValueError(
                f"{self.formula.structure}: expected "
                f"{self.formula.spec.n_anchors} anchors, got {len(self.anchors)}"
            )


def group_queries_by_formula(
    queries: Sequence[Query],
) -> Dict[str, Dict[Formula, list]]:
    """Group queries as {structure_name: {formula: [queries]}} — the layout
    the reference's loader produces (mpqe/data_utils.py
    load_queries_by_formula; SURVEY.md §2.1)."""
    out: Dict[str, Dict[Formula, list]] = {}
    for q in queries:
        by_f = out.setdefault(q.formula.structure, {})
        by_f.setdefault(q.formula, []).append(q)
    return out
