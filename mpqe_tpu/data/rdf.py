"""RDF / N-Triples ingestion: raw KG bytes -> :class:`KnowledgeGraph`.

The reference consumes PREPROCESSED pickles; the conversion of the RDF
benchmark KGs (AIFB / MUTAG / AM) into those pickles lives upstream of
the repo (SURVEY.md §2.1 "Data acquisition / preprocessing", §3.5).
This module closes that gap natively, with zero third-party RDF
dependencies (no rdflib in the image): a streaming N-Triples parser and
a deterministic RDF -> KnowledgeGraph conversion following the GQE
lineage's conventions:

- entity modes come from ``rdf:type`` objects — the lexicographically
  smallest type IRI per entity (deterministic under multi-typing);
  untyped entities fall into the ``__untyped__`` mode,
- triples whose object is a literal carry no graph structure → dropped,
- ``rdf:type`` triples type entities and are not themselves relations,
- a predicate observed with multiple (from_mode, to_mode) pairs splits
  into one base relation per pair — the reference's ``adj_lists`` are
  keyed by ``(from_mode, rel, to_mode)`` (SURVEY.md §A.3), so a single
  RDF predicate legitimately yields several relation ids,
- base relations with fewer than ``min_rel_count`` triples are pruned
  (the RDF benchmark preprocessing prunes infrequent predicates), and
  entities that survive in no kept triple are dropped with them.

``tools/prepare_dataset.py`` drives this end to end:
``.nt(.gz)`` -> ``graph_data.pkl`` + ``{train,val,test}_edges.pkl`` +
``{train,val,test}_queries_{2,3}.pkl`` (+ ``kg.npz``), a run-ready
dataset directory for ``train.py --data pkl:<dir>``.
"""

from __future__ import annotations

import gzip
from collections import Counter
from typing import Dict, Iterable, Iterator, List, Sequence, Tuple

import numpy as np

from mpqe_tpu.graph import KnowledgeGraph, make_knowledge_graph

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
UNTYPED_MODE = "__untyped__"


# ----------------------------------------------------------------------
# N-Triples parsing
# ----------------------------------------------------------------------
class NTriplesError(ValueError):
    pass


def _scan_term(line: str, pos: int) -> Tuple[str, bool, int]:
    """Parse one term starting at ``pos``; returns (term, is_literal,
    next_pos).  Terms: ``<IRI>``, ``_:blank``, or ``"literal"`` with
    backslash escapes and an optional ``@lang`` / ``^^<dtype>`` suffix
    (the suffix is consumed but discarded — literals are dropped by the
    KG conversion anyway)."""
    n = len(line)
    c = line[pos]
    if c == "<":
        end = line.find(">", pos + 1)
        if end < 0:
            raise NTriplesError(f"unterminated IRI: {line!r}")
        return line[pos + 1 : end], False, end + 1
    if c == "_":
        end = pos
        while end < n and not line[end].isspace():
            end += 1
        term = line[pos:end]
        # a blank-node label cannot END with '.' (PN_CHARS grammar), so a
        # trailing dot is the statement terminator written without the
        # optional whitespace ("... _:b0.")
        if term.endswith("."):
            term, end = term[:-1], end - 1
        return term, False, end
    if c == '"':
        i = pos + 1
        while i < n:
            if line[i] == "\\":
                i += 2
                continue
            if line[i] == '"':
                break
            i += 1
        if i >= n:
            raise NTriplesError(f"unterminated literal: {line!r}")
        lit = line[pos + 1 : i]
        i += 1
        # optional @lang or ^^<dtype>
        if i < n and line[i] == "@":
            # language tags are [a-zA-Z-0-9] only — '.' never belongs to
            # one, so stop there too ("...\"x\"@en.")
            while i < n and not line[i].isspace() and line[i] != ".":
                i += 1
        elif line.startswith("^^<", i):
            end = line.find(">", i + 3)
            if end < 0:
                raise NTriplesError(f"unterminated datatype IRI: {line!r}")
            i = end + 1
        return lit, True, i
    raise NTriplesError(f"unrecognized term at col {pos}: {line!r}")


def _skip_ws(line: str, pos: int) -> int:
    while pos < len(line) and line[pos].isspace():
        pos += 1
    return pos


def parse_ntriples(
    lines: Iterable[str],
) -> Iterator[Tuple[str, str, str, bool]]:
    """Yield ``(subject, predicate, object, object_is_literal)`` per
    statement.  Comment (``#``) and blank lines are skipped; each
    statement must end with ``.``."""
    for lineno, raw in enumerate(lines, 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        try:
            s, s_lit, pos = _scan_term(line, 0)
            if s_lit:
                raise NTriplesError("literal subject")
            pos = _skip_ws(line, pos)
            p, p_lit, pos = _scan_term(line, pos)
            if p_lit or not line[pos - 1] == ">":
                raise NTriplesError("predicate must be an IRI")
            pos = _skip_ws(line, pos)
            o, o_lit, pos = _scan_term(line, pos)
            pos = _skip_ws(line, pos)
            if pos >= len(line) or line[pos] != ".":
                raise NTriplesError("missing terminating '.'")
        except NTriplesError as e:
            raise NTriplesError(f"line {lineno}: {e}") from None
        yield s, p, o, o_lit


def iter_ntriples_file(path: str) -> Iterator[Tuple[str, str, str, bool]]:
    """Stream-parse an ``.nt`` or ``.nt.gz`` file."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        yield from parse_ntriples(f)


# ----------------------------------------------------------------------
# RDF -> KnowledgeGraph
# ----------------------------------------------------------------------
def kg_from_rdf(
    triples: Iterable[Tuple[str, str, str, bool]],
    *,
    type_pred: str = RDF_TYPE,
    min_rel_count: int = 1,
    drop_preds: Sequence[str] = (),
) -> KnowledgeGraph:
    """Convert parsed RDF statements into a KnowledgeGraph.

    Deterministic: modes sorted by type IRI, base relations sorted by
    (predicate, from_mode, to_mode), entity ids sorted by (mode, IRI) —
    the same bytes always produce the same id assignment.
    """
    drop = set(drop_preds)
    ent_type: Dict[str, str] = {}
    struct: List[Tuple[str, str, str]] = []
    for s, p, o, o_lit in triples:
        if p == type_pred:
            if not o_lit and (s not in ent_type or o < ent_type[s]):
                ent_type[s] = o
            continue
        if o_lit or p in drop:
            continue
        struct.append((s, p, o))
    if not struct:
        raise ValueError("no structural (entity-to-entity) triples found")

    struct = sorted(set(struct))  # dedup, deterministic order

    def mode_of(e: str) -> str:
        return ent_type.get(e, UNTYPED_MODE)

    # base relation = (predicate, from_mode_name, to_mode_name)
    rel_keys = [(p, mode_of(s), mode_of(o)) for s, p, o in struct]
    counts = Counter(rel_keys)
    kept_keys = sorted(k for k, c in counts.items() if c >= min_rel_count)
    if not kept_keys:
        raise ValueError(
            f"min_rel_count={min_rel_count} prunes every relation"
        )
    rel_id = {k: i for i, k in enumerate(kept_keys)}
    kept = [
        (s, o, rel_id[k])
        for (s, p, o), k in zip(struct, rel_keys)
        if k in rel_id
    ]

    # modes/entities over SURVIVING triples only (pruning a relation may
    # remove the last reference to an entity or a whole mode)
    ents = sorted(
        {s for s, _, _ in kept} | {o for _, o, _ in kept},
        key=lambda e: (mode_of(e), e),
    )
    mode_names = tuple(sorted({mode_of(e) for e in ents}))
    mode_id = {m: i for i, m in enumerate(mode_names)}
    eid = {e: i for i, e in enumerate(ents)}
    entity_mode = np.asarray([mode_id[mode_of(e)] for e in ents], np.int32)
    trip_arr = np.asarray(
        [(eid[s], r, eid[o]) for s, o, r in kept], np.int32
    )
    rel_domain = np.asarray([mode_id[k[1]] for k in kept_keys], np.int32)
    rel_range = np.asarray([mode_id[k[2]] for k in kept_keys], np.int32)
    # embed the mode pair in the name: keeps (from, name, to) pickle keys
    # unique even when one predicate spans several mode pairs
    rel_names = tuple(f"{p}|{fm}>{tm}" for p, fm, tm in kept_keys)
    return make_knowledge_graph(
        trip_arr,
        entity_mode,
        len(kept_keys),
        rel_domain=rel_domain,
        rel_range=rel_range,
        mode_names=mode_names,
        rel_names=rel_names,
    )


def load_ntriples_kg(path: str, **kw) -> KnowledgeGraph:
    """``.nt(.gz)`` file -> KnowledgeGraph (see :func:`kg_from_rdf`)."""
    return kg_from_rdf(iter_ntriples_file(path), **kw)
