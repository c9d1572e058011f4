"""Asynchronous batch pipeline: background packing + device prefetch.

The reference packs batches synchronously in the train loop (host-bound;
SURVEY.md §3).  This pipeline moves packing (C++ packer when available)
to a producer thread and keeps ``prefetch`` batches in flight, so the
accelerator never waits on the host: while step N executes, batch N+1 is
already packed and transferred.

Deterministic: the producer draws (structure, formula, pick, seed) from a
seeded numpy Generator, so a pipeline with the same seed yields the same
batch sequence as the synchronous loop logic it mirrors.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from mpqe_tpu.data import native as native_mod
from mpqe_tpu.data.batcher import DenseQueryBatch
from mpqe_tpu.data.store import FormulaStore, pack_dense_batch_np
from mpqe_tpu.queries import INTERSECTION_STRUCTURES

_STOP = object()


class BatchPipeline:
    """Produces packed (optionally device-put) DenseQueryBatches ahead of
    consumption.

    Args:
      stores: {structure: [FormulaStore]} (from data.store.build_stores).
      batch_size, n_neg: bucket shape.
      structures: which structures to draw from (uniform), or None = all.
      hard_neg_prob: P(hard negatives) on intersection structures.
      seed: RNG seed for the draw sequence.
      prefetch: queue depth.
      device_put: move arrays to the default device in the producer.
      steps_per_call: K > 1 emits K same-formula batches PRE-STACKED with
        a leading [K] axis (feeding the multistep ``lax.scan`` dispatch) —
        the draw order mirrors the synchronous multistep loop exactly, so
        trajectories are identical to the unpiped path with the same seed.
    """

    def __init__(
        self,
        stores: Dict[str, List[FormulaStore]],
        batch_size: int,
        n_neg: int,
        structures: Optional[List[str]] = None,
        hard_neg_prob: float = 0.5,
        seed: int = 0,
        prefetch: int = 2,
        device_put: bool = True,
        steps_per_call: int = 1,
    ):
        self.stores = {s: v for s, v in stores.items() if v}
        self.structures = structures or sorted(self.stores)
        self.batch_size = batch_size
        self.n_neg = n_neg
        self.hard_neg_prob = hard_neg_prob
        self.rng = np.random.default_rng(seed)
        self.device_put = device_put
        self.steps_per_call = steps_per_call
        self.use_native = native_mod.available()
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------
    def _make_one(self) -> DenseQueryBatch:
        structure = self.structures[self.rng.integers(len(self.structures))]
        f_stores = self.stores[structure]
        fstore = f_stores[self.rng.integers(len(f_stores))]
        pick = self.rng.integers(
            0, fstore.n_queries,
            size=min(self.batch_size, fstore.n_queries),
        ).astype(np.int64)
        use_hard = (
            structure in INTERSECTION_STRUCTURES
            and self.rng.random() < self.hard_neg_prob
        )
        seed = int(self.rng.integers(2**62))
        pack = (
            native_mod.pack_dense_batch_native
            if self.use_native
            else pack_dense_batch_np
        )
        first = pack(fstore, pick, self.batch_size, self.n_neg, seed,
                     use_hard)
        if self.steps_per_call <= 1:
            return first
        # K-1 extra same-formula batches, drawn in the same (pick, seed)
        # order the synchronous multistep loop uses
        batches = [first]
        for _ in range(self.steps_per_call - 1):
            pk = self.rng.integers(
                0, fstore.n_queries,
                size=min(self.batch_size, fstore.n_queries),
            ).astype(np.int64)
            sd = int(self.rng.integers(2**62))
            batches.append(pack(fstore, pk, self.batch_size, self.n_neg,
                                sd, use_hard))
        return stack_batches(batches)

    def _producer(self):
        while not self._stop.is_set():
            batch = self._make_one()
            if self.device_put:
                batch = _to_device(batch)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    # ------------------------------------------------------------------
    def start(self) -> "BatchPipeline":
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=5)

    def __enter__(self) -> "BatchPipeline":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def __iter__(self) -> Iterator[DenseQueryBatch]:
        return self

    def __next__(self) -> DenseQueryBatch:
        return self._q.get()


def stack_batches(batches) -> DenseQueryBatch:
    """K same-structure batches -> one batch whose arrays carry a leading
    [K] axis (the multistep scan's xs layout).  Stacking happens on the
    producer thread, so the train loop never touches numpy for it."""
    import dataclasses

    first = batches[0]
    stk = lambda f: np.stack([np.asarray(getattr(b, f)) for b in batches])
    return dataclasses.replace(
        first,
        node_entity=stk("node_entity"), node_mode=stk("node_mode"),
        edge_rel=stk("edge_rel"), edge_norm=stk("edge_norm"),
        target=stk("target"), negatives=stk("negatives"),
        neg_mask=stk("neg_mask"), query_mask=stk("query_mask"),
    )


def _to_device(batch: DenseQueryBatch) -> DenseQueryBatch:
    import dataclasses

    put = jax.device_put
    return dataclasses.replace(
        batch,
        node_entity=put(batch.node_entity),
        node_mode=put(batch.node_mode),
        edge_rel=put(batch.edge_rel),
        edge_norm=put(batch.edge_norm),
        target=put(batch.target),
        negatives=put(batch.negatives),
        neg_mask=put(batch.neg_mask),
        query_mask=put(batch.query_mask),
    )
