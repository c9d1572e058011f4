"""Readouts: batched node embeddings -> one query vector.

The reference's readout menu (mpqe/model.py ``RGCNEncoderDecoder``;
SURVEY.md §2.1): TGT (a.k.a. "TM": run ``diameter`` message-passing steps
and take the target node), SUM, MAX, CONCAT (pad-to-4-slots linear), and
MLP (deep-sets: per-node MLP, sum, outer MLP).

Dense form operates on ``[B, n_nodes, d]``; sparse form on flat ``[N, d]``
with a ``node_query`` segment map (segment ops replace torch-scatter).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mpqe_tpu.ops import segment as segment_ops

READOUTS = ("tgt", "sum", "max", "concat", "mlp")
MAX_TEMPLATE_NODES = 4  # largest canonical structure (SURVEY.md §A.2)


def init_readout(
    key: jax.Array, kind: str, d: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    if kind not in READOUTS:
        raise ValueError(f"unknown readout {kind!r}; options: {READOUTS}")
    params: Dict[str, jax.Array] = {}
    k1, k2 = jax.random.split(key)
    scale = jnp.sqrt(2.0 / (2 * d)).astype(dtype)
    if kind == "concat":
        params["w_cat"] = (
            jax.random.normal(k1, (MAX_TEMPLATE_NODES * d, d), dtype)
            * jnp.sqrt(2.0 / (MAX_TEMPLATE_NODES * d + d)).astype(dtype)
        )
        params["b_cat"] = jnp.zeros((d,), dtype)
    elif kind == "mlp":
        params["w_pre"] = jax.random.normal(k1, (d, d), dtype) * scale
        params["b_pre"] = jnp.zeros((d,), dtype)
        params["w_post"] = jax.random.normal(k2, (d, d), dtype) * scale
        params["b_post"] = jnp.zeros((d,), dtype)
    return params


def readout_dense(
    kind: str,
    params: Dict[str, jax.Array],
    x: jax.Array,  # [B, n_nodes, d]
    target_slot: int,
) -> jax.Array:
    B, n, d = x.shape
    if kind == "tgt":
        return x[:, target_slot, :]
    if kind == "sum":
        return jnp.sum(x, axis=1)
    if kind == "max":
        return jnp.max(x, axis=1)
    if kind == "concat":
        pad = jnp.zeros((B, MAX_TEMPLATE_NODES - n, d), x.dtype)
        flat = jnp.concatenate([x, pad], axis=1).reshape(B, MAX_TEMPLATE_NODES * d)
        return jnp.dot(flat, params["w_cat"], preferred_element_type=x.dtype) + params["b_cat"]
    if kind == "mlp":
        h = jax.nn.relu(
            jnp.einsum("bnd,do->bno", x, params["w_pre"]) + params["b_pre"]
        )
        pooled = jnp.sum(h, axis=1)
        return jnp.dot(pooled, params["w_post"]) + params["b_post"]
    raise ValueError(kind)


def readout_sparse(
    kind: str,
    params: Dict[str, jax.Array],
    x: jax.Array,  # [N, d]
    node_query: jax.Array,  # [N] int32
    target_node: jax.Array,  # [B] int32
    n_queries: int,
    n_template_nodes: Optional[int] = None,
    segment_backend: str = "xla",
) -> jax.Array:
    if kind == "tgt":
        return x[target_node]
    if kind == "sum":
        return segment_ops.segment_sum(
            x, node_query, n_queries, backend=segment_backend
        )
    if kind == "max":
        return segment_ops.segment_max(
            x, node_query, n_queries, backend=segment_backend
        )
    if kind == "concat":
        # Sparse batches from the dense batcher are slot-regular: reshape.
        n = n_template_nodes
        if n is None:
            raise ValueError("concat readout needs n_template_nodes")
        B = n_queries
        return readout_dense(kind, params, x.reshape(B, n, x.shape[-1]), 0)
    if kind == "mlp":
        h = jax.nn.relu(jnp.dot(x, params["w_pre"]) + params["b_pre"])
        pooled = segment_ops.segment_sum(
            h, node_query, n_queries, backend=segment_backend
        )
        return jnp.dot(pooled, params["w_post"]) + params["b_post"]
    raise ValueError(kind)
