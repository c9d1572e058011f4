"""Neighborhood aggregation encoders (GQE's GraphSAGE-style feature path).

Reference: mpqe/aggregators.py (``MeanAggregator`` / pooling variants) and
mpqe/encoders.py ``Encoder`` — an entity's representation is formed by
aggregating sampled neighbors' embeddings and combining with its own
(SURVEY.md §2.1; retained for the GQE baseline, unused by MPQE).

TPU-first redesign: neighbor *sampling* happens once on the host into a
fixed-fanout table ``[n_entities, fanout]`` (padded with the entity's own
id), so the device-side encoder is a static gather + masked mean/max/pool
+ linear combine — no per-batch sampling, no ragged shapes, jit-friendly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.graph import KnowledgeGraph

AGGREGATORS = ("mean", "max", "pool")


def build_neighbor_table(
    kg: KnowledgeGraph, fanout: int = 8, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Uniformly sample up to ``fanout`` (undirected) neighbors per entity.

    Returns ``{"idx": [n_entities, fanout] int32, "mask": ... float32}`` —
    entities with fewer neighbors are padded with their own id + mask 0.
    """
    rng = np.random.default_rng(seed)
    src, _, dst = kg.directed_edges()
    # shuffle edges within each source row (random key per edge, stable
    # lexsort by (src, key)), then keep each row's first <= fanout edges:
    # uniform sampling without replacement, fully vectorized — the
    # previous per-entity Python loop cost minutes at serve startup for
    # million-entity KGs.  Same distribution, different RNG stream: a
    # table built by an older version of this function will not be
    # bit-identical for the same seed.
    keys = rng.random(src.shape[0])
    order = np.lexsort((keys, src))
    src_s, dst_s = src[order], dst[order]
    ptr = np.searchsorted(src_s, np.arange(kg.n_entities + 1))
    pos = np.arange(src_s.shape[0], dtype=np.int64) - ptr[src_s]
    sel = pos < fanout
    idx = np.tile(np.arange(kg.n_entities, dtype=np.int32)[:, None], (1, fanout))
    mask = np.zeros((kg.n_entities, fanout), np.float32)
    idx[src_s[sel], pos[sel]] = dst_s[sel]
    mask[src_s[sel], pos[sel]] = 1.0
    return {"idx": idx, "mask": mask}


def build_neighbor_table_device(
    kg: KnowledgeGraph, fanout: int = 8, seed: int = 0
) -> Dict[str, jax.Array]:
    """:func:`build_neighbor_table` with idx/mask as device arrays — the
    one shared entry point for train/evaluate/serve/quality tooling so
    the (kg, fanout, seed) -> table contract can never drift between the
    path that trains a checkpoint and the path that rebuilds its table."""
    nt = build_neighbor_table(kg, fanout=fanout, seed=seed)
    return {"idx": jnp.asarray(nt["idx"]), "mask": jnp.asarray(nt["mask"])}


def init_neighborhood_encoder(
    key: jax.Array, d: int, aggregator: str = "mean", dtype=jnp.float32
) -> Dict[str, jax.Array]:
    if aggregator not in AGGREGATORS:
        raise ValueError(f"aggregator {aggregator}")
    k1, k2 = jax.random.split(key)
    scale = jnp.sqrt(2.0 / (2 * d)).astype(dtype)
    params = {
        # combine [self ; agg] -> d
        "w_combine": jax.random.normal(k1, (2 * d, d), dtype) * scale,
        "b_combine": jnp.zeros((d,), dtype),
    }
    if aggregator == "pool":
        params["w_pool"] = jax.random.normal(k2, (d, d), dtype) * scale
        params["b_pool"] = jnp.zeros((d,), dtype)
    return params


def encode_entities(
    params: Dict[str, jax.Array],
    ent_table: jax.Array,  # [n_entities, d]
    neighbor_idx: jax.Array,  # [n_entities, fanout] (or a row-subset)
    neighbor_mask: jax.Array,
    entity_ids: jax.Array,  # [...] int32
    aggregator: str = "mean",
) -> jax.Array:
    """GraphSAGE-style entity encoding: combine(self, agg(neighbors)).

    ``neighbor_idx/mask`` must be the full-table versions (rows indexed by
    entity id).  Output matches ``entity_ids.shape + (d,)``.
    """
    flat = entity_ids.reshape(-1)
    self_emb = ent_table[flat]  # [N, d]
    nb = ent_table[neighbor_idx[flat]]  # [N, F, d]
    m = neighbor_mask[flat][:, :, None]  # [N, F, 1]
    if aggregator == "mean":
        agg = jnp.sum(nb * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    elif aggregator == "max":
        agg = jnp.max(jnp.where(m > 0, nb, -jnp.inf), axis=1)
        agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
    else:  # pool: per-neighbor MLP then max
        h = jax.nn.relu(
            jnp.einsum("nfd,do->nfo", nb, params["w_pool"]) + params["b_pool"]
        )
        agg = jnp.max(jnp.where(m > 0, h, -jnp.inf), axis=1)
        agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
    out = jax.nn.relu(
        jnp.dot(
            jnp.concatenate([self_emb, agg], axis=-1), params["w_combine"]
        )
        + params["b_combine"]
    )
    return out.reshape(entity_ids.shape + (out.shape[-1],))
