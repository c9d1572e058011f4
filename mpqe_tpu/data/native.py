"""ctypes bindings to the C++ host runtime (cpp/libmpqe_host.so).

Exposes the native batch packer, edge-store builder, synthetic-KG
generator, and batched query sampler; every entry point has a pure-
NumPy/Python fallback (store.pack_dense_batch_np, edge_store.build_edge_store,
sampler.make_random_kg) so the framework works without the compiled
library.  ``available()`` reports whether the native path is active;
``ensure_built()`` compiles it on demand via make (g++ is in the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from mpqe_tpu.data.batcher import DenseQueryBatch, template_edge_norm
from mpqe_tpu.data.store import FormulaStore
from mpqe_tpu.ops.edge_store import EdgeStore

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_PATH = os.path.abspath(os.path.join(_CPP_DIR, "libmpqe_host.so"))
_lib: Optional[ctypes.CDLL] = None

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def ensure_built(quiet: bool = True) -> bool:
    """Compile the library if missing; returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CPP_DIR)],
                check=True,
                capture_output=quiet,
            )
        except Exception:
            return False
    try:
        _lib = _load(_LIB_PATH)
        return True
    except Exception:
        _lib = None
        return False


def _load(path: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(path)
    lib.pack_dense_batch.restype = ctypes.c_int
    lib.pack_dense_batch.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32,  # anchors, n_q, n_anchor_slots
        _i32p,  # targets
        _i32p, _i64p,  # neg pool/ptr
        _i32p, _i64p, ctypes.c_int32,  # hard pool/ptr, use_hard
        _i32p, ctypes.c_int64,  # fallback pool, size (0 = disabled)
        _i32p, _i64p, _i32p, ctypes.c_int32,  # ans pool/ptr/idx, has_ans
        _i32p, ctypes.c_int32,  # anchor_slot_ids, n_nodes
        _i64p, ctypes.c_int64,  # pick, n_pick
        ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,  # B, n_neg, seed
        _i32p, _i32p, _i32p, _f32p, _f32p,  # outputs
    ]
    lib.build_edge_store_c.restype = ctypes.c_int
    lib.build_edge_store_c.argtypes = [
        ctypes.c_int64, _i32p, _i32p, _i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        _i32p, _i32p, _i32p, _f32p, _i32p,
    ]
    lib.make_synthetic_kg.restype = ctypes.c_int
    lib.make_synthetic_kg.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_uint64,
        _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
    ]
    lib.build_incoming_csr.restype = ctypes.c_int
    lib.build_incoming_csr.argtypes = [
        ctypes.c_int64, _i32p, _i32p, _i32p, ctypes.c_int64,
        _i64p, _i32p, _i32p,
    ]
    lib.sample_chain_queries.restype = ctypes.c_int
    lib.sample_chain_queries.argtypes = [
        _i64p, _i32p, _i32p,
        ctypes.c_int64, _i32p,
        _i64p, ctypes.c_int32,
        _i32p, _i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
        _i32p, _i32p, _i32p,
    ]
    lib.nt_parse.restype = ctypes.c_uint64
    lib.nt_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.nt_export.restype = ctypes.c_int
    lib.nt_export.argtypes = [
        ctypes.c_uint64, _i32p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        _i64p, ctypes.c_char_p,
    ]
    lib.nt_free.restype = None
    lib.nt_free.argtypes = [ctypes.c_uint64]
    return lib


def available() -> bool:
    return _lib is not None or ensure_built()


# ----------------------------------------------------------------------
def pack_dense_batch_native(
    store: FormulaStore,
    pick: np.ndarray,
    batch_size: int,
    n_neg: int,
    seed: int,
    use_hard: bool = False,
) -> DenseQueryBatch:
    """Native batch packer (drop-in for store.pack_dense_batch_np)."""
    assert _lib is not None, "call ensure_built() first"
    spec = store.formula.spec
    B = batch_size
    node_entity = np.zeros((B, spec.n_nodes), np.int32)
    node_mode = np.broadcast_to(
        np.asarray(store.formula.node_modes, np.int32)[None, :],
        (B, spec.n_nodes),
    ).copy()
    target = np.zeros((B,), np.int32)
    negatives = np.zeros((B, n_neg), np.int32)
    neg_mask = np.zeros((B, n_neg), np.float32)
    query_mask = np.zeros((B,), np.float32)
    anchor_slots = np.asarray(spec.anchor_slots, np.int32)
    pick64 = np.ascontiguousarray(pick, np.int64)
    # hard/fallback pools may be empty -> pass 1-element dummies
    hp = store.hard_pool if store.hard_pool.size else np.zeros(1, np.int32)
    fb = store.fallback_pool
    fb_size = 0 if fb is None else int(fb.size)
    rc = _lib.pack_dense_batch(
        np.ascontiguousarray(store.anchors), store.n_queries,
        spec.n_anchors,
        np.ascontiguousarray(store.targets),
        np.ascontiguousarray(store.neg_pool)
        if store.neg_pool.size else np.zeros(1, np.int32),
        np.ascontiguousarray(store.neg_ptr),
        np.ascontiguousarray(hp),
        np.ascontiguousarray(store.hard_ptr),
        1 if use_hard else 0,
        np.ascontiguousarray(fb) if fb_size else np.zeros(1, np.int32),
        fb_size,
        np.ascontiguousarray(store.ans_pool)
        if store.ans_idx is not None and store.ans_pool.size
        else np.zeros(1, np.int32),
        np.ascontiguousarray(store.ans_ptr)
        if store.ans_idx is not None else np.zeros(2, np.int64),
        np.ascontiguousarray(store.ans_idx)
        if store.ans_idx is not None else np.zeros(1, np.int32),
        1 if store.ans_idx is not None else 0,
        anchor_slots, spec.n_nodes,
        pick64, len(pick64),
        B, n_neg, seed,
        node_entity, target, negatives, neg_mask, query_mask,
    )
    if rc != 0:
        raise RuntimeError(f"pack_dense_batch failed rc={rc}")
    return DenseQueryBatch(
        structure=store.formula.structure,
        n_queries=len(pick64),
        node_entity=node_entity,
        node_mode=node_mode,
        edge_rel=np.asarray(store.formula.rels, np.int32),
        edge_norm=template_edge_norm(spec, store.formula.rels),
        target=target,
        negatives=negatives,
        neg_mask=neg_mask,
        query_mask=query_mask,
        used_hard=use_hard,
    )


def build_edge_store_native(
    src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
    n_nodes: int, n_rels: int, capacity: Optional[int] = None,
) -> EdgeStore:
    assert _lib is not None, "call ensure_built() first"
    n_e = int(len(src))
    cap = capacity if capacity is not None else n_e
    o_src = np.empty(cap, np.int32)
    o_dst = np.empty(cap, np.int32)
    o_rel = np.empty(cap, np.int32)
    o_norm = np.empty(cap, np.float32)
    rel_ptr = np.empty(n_rels + 2, np.int32)
    rc = _lib.build_edge_store_c(
        n_e, np.ascontiguousarray(src, np.int32),
        np.ascontiguousarray(dst, np.int32),
        np.ascontiguousarray(rel, np.int32),
        n_nodes, n_rels, cap,
        o_src, o_dst, o_rel, o_norm, rel_ptr,
    )
    if rc != 0:
        raise RuntimeError(f"build_edge_store_c failed rc={rc}")
    return EdgeStore(
        src=o_src, dst=o_dst, rel=o_rel, norm=o_norm, rel_ptr=rel_ptr,
        n_edges=n_e, n_nodes=n_nodes, n_rels=n_rels,
    )


def make_synthetic_kg_native(
    n_entities: int, n_modes: int, n_base_rels: int, n_triples: int,
    seed: int = 0,
):
    """Schema-respecting random KG at native speed (contiguous mode
    blocks).  Returns a KnowledgeGraph."""
    from mpqe_tpu.graph import KnowledgeGraph

    assert _lib is not None, "call ensure_built() first"
    entity_mode = np.empty(n_entities, np.int32)
    rel_domain = np.empty(n_base_rels, np.int32)
    rel_range = np.empty(n_base_rels, np.int32)
    heads = np.empty(n_triples, np.int32)
    rels = np.empty(n_triples, np.int32)
    tails = np.empty(n_triples, np.int32)
    rc = _lib.make_synthetic_kg(
        n_entities, n_modes, n_base_rels, n_triples, seed,
        entity_mode, rel_domain, rel_range, heads, rels, tails,
    )
    if rc != 0:
        raise RuntimeError(f"make_synthetic_kg failed rc={rc}")
    return KnowledgeGraph(
        n_entities=n_entities, n_base_rels=n_base_rels,
        entity_mode=entity_mode, rel_domain=rel_domain, rel_range=rel_range,
        heads=heads, rels=rels, tails=tails,
    )


def build_incoming_csr_native(kg) -> Dict[str, np.ndarray]:
    """One-time incoming-edge CSR build (cache and pass to
    sample_queries_native — the build is the expensive part)."""
    assert _lib is not None, "call ensure_built() first"
    n_ent = kg.n_entities
    n_in = 2 * kg.n_triples
    in_ptr = np.empty(n_ent + 1, np.int64)
    in_rel = np.empty(max(n_in, 1), np.int32)
    in_src = np.empty(max(n_in, 1), np.int32)
    rc = _lib.build_incoming_csr(
        kg.n_triples, np.ascontiguousarray(kg.heads),
        np.ascontiguousarray(kg.rels), np.ascontiguousarray(kg.tails),
        n_ent, in_ptr, in_rel, in_src,
    )
    if rc != 0:
        raise RuntimeError(f"build_incoming_csr failed rc={rc}")
    return {"in_ptr": in_ptr, "in_rel": in_rel, "in_src": in_src}


def sample_queries_native(
    kg, structure: str, n_samples: int, n_neg: int, seed: int = 0,
    csr: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Batched backward-walk query sampling (benchmark-scale fast path;
    negatives are uniform same-mode non-target entities, not answer-set
    checked — use data.sampler.QuerySampler for protocol-exact data).

    Requires a contiguous-mode KG (the native synthetic generator's
    layout).  Returns {entities [n, n_nodes], rels [n, n_edges],
    negatives [n, n_neg]}; failed rows have entities[:,0] == -1.
    """
    from mpqe_tpu.queries import STRUCTURES

    assert _lib is not None, "call ensure_built() first"
    spec = STRUCTURES[structure]
    n_ent = kg.n_entities
    mode_start = np.searchsorted(
        kg.entity_mode, np.arange(kg.n_modes + 1)
    ).astype(np.int64)
    if not np.all(np.diff(kg.entity_mode) >= 0):
        raise ValueError("native sampler needs contiguous-mode entity ids")
    if csr is None:
        csr = build_incoming_csr_native(kg)
    in_ptr, in_rel, in_src = csr["in_ptr"], csr["in_rel"], csr["in_src"]
    entities = np.empty((n_samples, spec.n_nodes), np.int32)
    rels = np.empty((n_samples, spec.n_edges), np.int32)
    negs = np.empty((n_samples, max(n_neg, 1)), np.int32)
    rc = _lib.sample_chain_queries(
        in_ptr, in_rel, in_src, n_ent,
        np.ascontiguousarray(kg.entity_mode),
        mode_start, kg.n_modes,
        np.asarray(spec.edge_src, np.int32),
        np.asarray(spec.edge_dst, np.int32),
        spec.n_edges, spec.n_nodes,
        n_samples, n_neg, seed,
        entities, rels, negs,
    )
    if rc != 0:
        raise RuntimeError(f"sample_chain_queries failed rc={rc}")
    return {"entities": entities, "rels": rels, "negatives": negs}


# ----------------------------------------------------------------------
def parse_ntriples_native(data: bytes):
    """Native N-Triples parse + term interning (cpp nt_parse).

    Returns ``(spo [n, 3] int32 term ids, o_lit [n] bool, terms)`` —
    array-identical to ``rdf.intern_statements(rdf.parse_ntriples(...))``
    on the same bytes (pinned in tests/test_rdf.py).  Raises
    ``rdf.NTriplesError`` with the 1-based line on grammar errors."""
    assert _lib is not None, "call ensure_built() first"
    from mpqe_tpu.data.rdf import NTriplesError

    n_trip = ctypes.c_int64()
    n_terms = ctypes.c_int64()
    term_bytes = ctypes.c_int64()
    err_line = ctypes.c_int64()
    handle = _lib.nt_parse(
        data, len(data),
        ctypes.byref(n_trip), ctypes.byref(n_terms),
        ctypes.byref(term_bytes), ctypes.byref(err_line))
    try:
        if err_line.value:
            raise NTriplesError(
                f"line {err_line.value}: invalid N-Triples statement")
        spo = np.empty((max(n_trip.value, 1), 3), np.int32)
        o_lit = np.empty(max(n_trip.value, 1), np.uint8)
        offs = np.empty(n_terms.value + 1, np.int64)
        buf = ctypes.create_string_buffer(max(term_bytes.value, 1))
        rc = _lib.nt_export(handle, spo, o_lit, offs, buf)
        if rc != 0:
            raise RuntimeError("nt_export failed")
    finally:
        _lib.nt_free(handle)
    raw = buf.raw[: term_bytes.value]
    terms = [raw[offs[i]:offs[i + 1]].decode("utf-8", "replace")
             for i in range(n_terms.value)]
    spo = spo[: n_trip.value]
    # C++ interns raw BYTES; the Python twin interns decoded text.  On
    # invalid UTF-8 the errors='replace' decode can merge byte-distinct
    # terms — re-intern the decoded strings (first-seen order preserved)
    # so the id space matches the Python parser on any input.
    if len(set(terms)) != len(terms):
        remap: Dict[str, int] = {}
        dedup: list = []
        new_id = np.empty(len(terms), np.int32)
        for i, t in enumerate(terms):
            j = remap.get(t)
            if j is None:
                j = remap[t] = len(dedup)
                dedup.append(t)
            new_id[i] = j
        spo = new_id[spo]
        terms = dedup
    return spo, o_lit[: n_trip.value].astype(bool), terms
