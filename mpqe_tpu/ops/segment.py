"""Segment reductions (sum / max / mean) — the TPU replacements for the
reference's torch-scatter CUDA kernels (scatter_add / scatter_max;
SURVEY.md §2.2).

Two implementations share one API:

  * ``backend="xla"`` — ``jax.ops.segment_*``: XLA lowers these to sorted
    scatter ops; always correct, the oracle for everything else.
  * ``backend="pallas"`` — tiled Pallas kernels in ``ops/pallas_segment.py``
    for the dst-sorted layout the EdgeStore guarantees.

All functions are static-shape: ``num_segments`` is a Python int, inputs
may be padded (padding rows must carry ``segment_id == num_segments`` or a
zero weight — both are handled by clamping + masking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    backend: str = "xla",
) -> jax.Array:
    """Sum rows of ``data [E, d]`` into ``[num_segments, d]`` buckets.

    Rows whose ``segment_ids`` fall outside ``[0, num_segments)`` are
    dropped (this is how padded edges are ignored).
    """
    if backend == "pallas":
        from mpqe_tpu.ops import pallas_segment

        return pallas_segment.segment_sum_pallas(data, segment_ids, num_segments)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    backend: str = "xla",
    empty_value: float = 0.0,
) -> jax.Array:
    """Max-reduce rows into segments; empty segments get ``empty_value``."""
    if backend == "pallas":
        from mpqe_tpu.ops import pallas_segment

        out = pallas_segment.segment_max_pallas(data, segment_ids, num_segments)
    else:
        out = jax.ops.segment_max(
            data, segment_ids, num_segments=num_segments, indices_are_sorted=False
        )
    return jnp.where(out <= NEG_INF / 2, jnp.asarray(empty_value, out.dtype), out)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    backend: str = "xla",
) -> jax.Array:
    s = segment_sum(data, segment_ids, num_segments, backend=backend)
    ones = jnp.ones((data.shape[0], 1), dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, backend=backend)
    return s / jnp.maximum(cnt, 1.0)


def segment_softmax_weights(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Per-segment softmax over a flat ``[E]`` logit vector (utility for
    attention-style readouts)."""
    m = segment_max(logits[:, None], segment_ids, num_segments)[:, 0]
    shifted = logits - m[segment_ids]
    e = jnp.exp(shifted)
    z = segment_sum(e[:, None], segment_ids, num_segments)[:, 0]
    return e / jnp.maximum(z[segment_ids], 1e-30)
