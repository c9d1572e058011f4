"""Knowledge-graph data model (host side).

Replaces the reference's ``mpqe/graph.py`` ``Graph`` (dict-of-sets adjacency
keyed by (from_mode, rel, to_mode); SURVEY.md §2.1) with an array-native
store: triples as flat numpy arrays plus CSR adjacency per directed
relation.  Directed relation ids already include inverses: a base relation
``r`` gets forward id ``2*r`` and inverse id ``2*r + 1`` (the reference
doubles its relation vocab the same way for the R-GCN; SURVEY.md §A.1).

Everything here is host-side preprocessing — device code only ever sees
integer arrays produced from this.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


def forward_rel_id(base_rel: int) -> int:
    return 2 * base_rel


def inverse_rel_id(base_rel: int) -> int:
    return 2 * base_rel + 1


def invert_rel_id(rel_id: int) -> int:
    """Invert a directed relation id (forward <-> inverse)."""
    return rel_id ^ 1


@dataclasses.dataclass
class KnowledgeGraph:
    """A relation-typed KG over mode-typed entities.

    Attributes:
      n_entities: total entity count (global id space across modes).
      n_base_rels: number of base (undirected) relation types.  Directed
        relation vocab size is ``2 * n_base_rels``.
      entity_mode: ``[n_entities] int32`` — mode id per entity.
      mode_names / rel_names: optional human-readable names.
      rel_domain / rel_range: per base relation, the (from_mode, to_mode).
      heads/rels/tails: the triple store, ``[n_triples] int32`` each, with
        ``rels`` holding *base* relation ids and edges stored head->tail.
    """

    n_entities: int
    n_base_rels: int
    entity_mode: np.ndarray
    rel_domain: np.ndarray
    rel_range: np.ndarray
    heads: np.ndarray
    rels: np.ndarray
    tails: np.ndarray
    mode_names: Tuple[str, ...] = ()
    rel_names: Tuple[str, ...] = ()

    # lazily built indices
    _csr: Optional[dict] = dataclasses.field(default=None, repr=False)
    _mode_entities: Optional[List[np.ndarray]] = dataclasses.field(
        default=None, repr=False
    )

    @property
    def n_modes(self) -> int:
        return int(self.entity_mode.max()) + 1 if self.entity_mode.size else 0

    @property
    def n_rels(self) -> int:
        """Directed relation vocab size (forward + inverse)."""
        return 2 * self.n_base_rels

    @property
    def n_triples(self) -> int:
        return int(self.heads.shape[0])

    # ------------------------------------------------------------------
    # Directed edge view: every triple yields a forward and an inverse edge.
    # ------------------------------------------------------------------
    def directed_edges(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All directed edges as (src, rel_id, dst) with inverses included."""
        src = np.concatenate([self.heads, self.tails])
        dst = np.concatenate([self.tails, self.heads])
        rel = np.concatenate(
            [forward_rel_id(self.rels), inverse_rel_id(self.rels)]
        ).astype(np.int32)
        return src.astype(np.int32), rel, dst.astype(np.int32)

    # ------------------------------------------------------------------
    # CSR adjacency per directed relation: neighbors(rel, node) in O(1).
    # Used by the query sampler (walks backwards from targets) — the analog
    # of the reference's adj_lists dict-of-sets (SURVEY.md §2.1), but flat.
    # ------------------------------------------------------------------
    def _build_csr(self) -> None:
        src, rel, dst = self.directed_edges()
        # sort by (rel, src) -> CSR over the combined key
        order = np.lexsort((src, rel))
        src, rel, dst = src[order], rel[order], dst[order]
        key = rel.astype(np.int64) * self.n_entities + src.astype(np.int64)
        n_keys = self.n_rels * self.n_entities
        # offsets via searchsorted on the sorted key array (avoid a dense
        # n_rels*n_entities bincount for large KGs)
        self._csr = {"key_sorted": key, "dst": dst, "n_keys": n_keys}

    def neighbors(self, rel_id: int, node: int) -> np.ndarray:
        """Entities reachable from ``node`` via directed relation ``rel_id``."""
        if self._csr is None:
            self._build_csr()
        key = np.int64(rel_id) * self.n_entities + np.int64(node)
        ks = self._csr["key_sorted"]
        lo = np.searchsorted(ks, key, side="left")
        hi = np.searchsorted(ks, key, side="right")
        return self._csr["dst"][lo:hi]

    def entities_of_mode(self, mode: int) -> np.ndarray:
        if self._mode_entities is None:
            order = np.argsort(self.entity_mode, kind="stable")
            bounds = np.searchsorted(
                self.entity_mode[order], np.arange(self.n_modes + 1)
            )
            self._mode_entities = [
                order[bounds[m] : bounds[m + 1]].astype(np.int32)
                for m in range(self.n_modes)
            ]
        return self._mode_entities[mode]

    def rel_id_modes(self, rel_id: int) -> Tuple[int, int]:
        """(from_mode, to_mode) of a *directed* relation id."""
        base, is_inv = rel_id // 2, rel_id % 2
        d, r = int(self.rel_domain[base]), int(self.rel_range[base])
        return (r, d) if is_inv else (d, r)

    def validate(self) -> None:
        assert self.heads.min() >= 0 and self.heads.max() < self.n_entities
        assert self.tails.min() >= 0 and self.tails.max() < self.n_entities
        assert self.rels.min() >= 0 and self.rels.max() < self.n_base_rels
        assert self.entity_mode.shape == (self.n_entities,)


def make_knowledge_graph(
    triples: Sequence[Tuple[int, int, int]] | np.ndarray,
    entity_mode: Sequence[int] | np.ndarray,
    n_base_rels: int,
    rel_domain: Optional[Sequence[int]] = None,
    rel_range: Optional[Sequence[int]] = None,
    mode_names: Tuple[str, ...] = (),
    rel_names: Tuple[str, ...] = (),
) -> KnowledgeGraph:
    """Build a KnowledgeGraph from (head, base_rel, tail) triples.

    If rel_domain/rel_range are omitted they are inferred from the triples
    (mode of the first head/tail seen per relation).
    """
    t = np.asarray(triples, dtype=np.int32).reshape(-1, 3)
    entity_mode = np.asarray(entity_mode, dtype=np.int32)
    heads, rels, tails = t[:, 0], t[:, 1], t[:, 2]
    if rel_domain is None or rel_range is None:
        rel_domain = np.zeros(n_base_rels, dtype=np.int32)
        rel_range = np.zeros(n_base_rels, dtype=np.int32)
        first = {}
        for h, r, tl in zip(heads, rels, tails):
            if int(r) not in first:
                first[int(r)] = True
                rel_domain[r] = entity_mode[h]
                rel_range[r] = entity_mode[tl]
    kg = KnowledgeGraph(
        n_entities=int(entity_mode.shape[0]),
        n_base_rels=int(n_base_rels),
        entity_mode=entity_mode,
        rel_domain=np.asarray(rel_domain, dtype=np.int32),
        rel_range=np.asarray(rel_range, dtype=np.int32),
        heads=heads.copy(),
        rels=rels.copy(),
        tails=tails.copy(),
        mode_names=mode_names,
        rel_names=rel_names,
    )
    kg.validate()
    return kg
