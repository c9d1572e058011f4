"""Query-graph batching: same-formula query lists -> static-shape device arrays.

This replaces the reference's ``RGCNQueryDataset`` / per-batch PyG graph
construction (mpqe/data_utils.py; SURVEY.md §2.1 "Query-graph batcher") —
the reference's host-side throughput bottleneck.  TPU-first redesign:

* A batch of B same-formula queries is **dense**: node features are
  ``[B, n_nodes, d]``, the template's edge slots are static Python ints,
  and only the formula's relation ids / normalizers are traced arrays.
  One XLA compilation serves every formula of a given (structure,
  bucket-size) pair.

* Bucketing: batch sizes are rounded up to fixed buckets (powers of two by
  default) and padded with a query mask, so the whole training run
  compiles a handful of programs ahead of time instead of recompiling per
  batch like the reference recompiles its Python graph build.

* A sparse view (flat node arrays + relation-sorted EdgeStore) of the same
  batch feeds the general sparse kernels and the distributed
  edge-partitioned path; ``dense`` and ``sparse`` forms are
  interconvertible and tested to produce identical model outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from mpqe_tpu.queries import STRUCTURES, Formula, Query, QueryStructure
from mpqe_tpu.ops.edge_store import EdgeStore, build_edge_store


def bucket_size(n: int, min_bucket: int = 16) -> int:
    """Round a batch size up to the next power-of-two bucket."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass(frozen=True)
class DenseQueryBatch:
    """B same-formula queries as dense template-slot arrays.

    Static (Python) fields — part of the jit cache key:
      structure: structure name.
      n_queries: true (unpadded) query count.

    Traced arrays (numpy here; moved to device by the model):
      node_entity: ``[B, n_nodes] int32`` entity id per anchor slot (0 on
        variable/target slots — those rows are ignored by the embedder).
      node_mode: ``[B, n_nodes] int32`` entity-mode id per slot (selects
        the per-mode variable embedding on free slots).
      edge_rel: ``[n_edges] int32`` formula relations (template-edge order).
      edge_norm: ``[n_edges] float32`` 1/c_{dst,rel} within the template.
      target: ``[B] int32`` true answer entity ids.
      negatives: ``[B, K] int32`` negative answer ids.
      neg_mask: ``[B, K] float32`` 1 on real negatives.
      query_mask: ``[B] float32`` 1 on real (unpadded) queries.
    """

    structure: str
    n_queries: int
    node_entity: np.ndarray
    node_mode: np.ndarray
    edge_rel: np.ndarray
    edge_norm: np.ndarray
    target: np.ndarray
    negatives: np.ndarray
    neg_mask: np.ndarray
    query_mask: np.ndarray
    # True when ``negatives`` were drawn from the hard (strict-subset)
    # pools — lets the train loop apply TrainConfig.hard_margin to hard
    # batches (static, part of no jit key: the loop routes on it)
    used_hard: bool = False

    @property
    def spec(self) -> QueryStructure:
        return STRUCTURES[self.structure]

    @property
    def batch_size(self) -> int:
        return int(self.node_entity.shape[0])


@dataclasses.dataclass(frozen=True)
class SparseQueryBatch:
    """The same batch flattened: one big relation-typed graph.

    node_* arrays have length ``B * n_nodes`` (node ``b * n_nodes + slot``);
    ``node_query`` maps node -> query index (for sum/max readouts via
    segment ops), ``target_node`` gives the target node index per query.
    """

    structure: str
    n_queries: int
    node_entity: np.ndarray  # [N] int32
    node_mode: np.ndarray  # [N] int32
    node_is_var: np.ndarray  # [N] float32 (1 on variable/target slots)
    node_query: np.ndarray  # [N] int32
    target_node: np.ndarray  # [B] int32
    edges: EdgeStore
    target: np.ndarray
    negatives: np.ndarray
    neg_mask: np.ndarray
    query_mask: np.ndarray

    @property
    def n_nodes(self) -> int:
        return int(self.node_entity.shape[0])


def template_edge_norm(spec: QueryStructure, rels: Sequence[int]) -> np.ndarray:
    """1 / |N_r(dst)| per template edge (mean-per-relation; SURVEY.md §A.1)."""
    counts: Dict[Tuple[int, int], int] = {}
    for j in range(spec.n_edges):
        k = (spec.edge_dst[j], int(rels[j]))
        counts[k] = counts.get(k, 0) + 1
    return np.array(
        [1.0 / counts[(spec.edge_dst[j], int(rels[j]))] for j in range(spec.n_edges)],
        dtype=np.float32,
    )


def make_dense_batch(
    formula: Formula,
    queries: Sequence[Query],
    batch_size: Optional[int] = None,
    n_neg: int = 1,
    rng: Optional[np.random.Generator] = None,
    use_hard_negatives: bool = False,
) -> DenseQueryBatch:
    """Pack same-formula queries into a padded dense batch.

    Negatives are drawn (with replacement if needed) from each query's
    pre-sampled ``neg_samples`` (or ``hard_neg_samples`` when requested and
    available — the reference uses hard negatives for intersection
    structures; SURVEY.md §A.4).
    """
    spec = formula.spec
    n_q = len(queries)
    if n_q == 0:
        raise ValueError("empty query batch")
    B = batch_size if batch_size is not None else bucket_size(n_q)
    if B < n_q:
        raise ValueError(f"batch_size {B} < n_queries {n_q}")
    rng = rng or np.random.default_rng(0)

    node_entity = np.zeros((B, spec.n_nodes), dtype=np.int32)
    node_mode = np.zeros((B, spec.n_nodes), dtype=np.int32)
    node_mode[:] = np.asarray(formula.node_modes, dtype=np.int32)[None, :]
    target = np.zeros((B,), dtype=np.int32)
    negatives = np.zeros((B, n_neg), dtype=np.int32)
    neg_mask = np.zeros((B, n_neg), dtype=np.float32)
    query_mask = np.zeros((B,), dtype=np.float32)

    for b, q in enumerate(queries):
        for a_i, slot in enumerate(spec.anchor_slots):
            node_entity[b, slot] = q.anchors[a_i]
        target[b] = q.target
        pool = (
            q.hard_neg_samples
            if (use_hard_negatives and q.hard_neg_samples)
            else q.neg_samples
        )
        if pool:
            pool_arr = np.asarray(pool, dtype=np.int32)
            take = rng.choice(
                pool_arr, size=n_neg, replace=len(pool_arr) < n_neg
            )
            negatives[b] = take
            neg_mask[b] = 1.0
        query_mask[b] = 1.0

    # pad rows replicate query 0 so padded compute stays in-range
    if n_q < B:
        node_entity[n_q:] = node_entity[0]
        target[n_q:] = target[0]
        negatives[n_q:] = negatives[0]

    return DenseQueryBatch(
        structure=formula.structure,
        n_queries=n_q,
        node_entity=node_entity,
        node_mode=node_mode,
        edge_rel=np.asarray(formula.rels, dtype=np.int32),
        edge_norm=template_edge_norm(spec, formula.rels),
        target=target,
        negatives=negatives,
        neg_mask=neg_mask,
        query_mask=query_mask,
        used_hard=use_hard_negatives,
    )


def dense_to_sparse(
    batch: DenseQueryBatch,
    n_rels: int,
    edge_capacity: Optional[int] = None,
) -> SparseQueryBatch:
    """Flatten a dense batch into one relation-sorted batched graph."""
    spec = batch.spec
    B, n = batch.batch_size, spec.n_nodes
    N = B * n

    node_entity = batch.node_entity.reshape(N).copy()
    node_mode = batch.node_mode.reshape(N).copy()
    is_var = np.zeros((n,), dtype=np.float32)
    for s in spec.free_slots:
        is_var[s] = 1.0
    node_is_var = np.tile(is_var, B)
    node_query = np.repeat(np.arange(B, dtype=np.int32), n)
    target_node = (
        np.arange(B, dtype=np.int32) * n + np.int32(spec.target_slot)
    )

    offs = np.arange(B, dtype=np.int32)[:, None] * n  # [B, 1]
    src = (offs + np.asarray(spec.edge_src, dtype=np.int32)[None, :]).reshape(-1)
    dst = (offs + np.asarray(spec.edge_dst, dtype=np.int32)[None, :]).reshape(-1)
    rel = np.tile(batch.edge_rel, B)
    norm = np.tile(batch.edge_norm, B)

    edges = build_edge_store(
        src, dst, rel, n_nodes=N, n_rels=n_rels,
        capacity=edge_capacity, norm=norm,
    )
    return SparseQueryBatch(
        structure=batch.structure,
        n_queries=batch.n_queries,
        node_entity=node_entity,
        node_mode=node_mode,
        node_is_var=node_is_var,
        node_query=node_query,
        target_node=target_node,
        edges=edges,
        target=batch.target,
        negatives=batch.negatives,
        neg_mask=batch.neg_mask,
        query_mask=batch.query_mask,
    )
