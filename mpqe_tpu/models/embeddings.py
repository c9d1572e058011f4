"""Entity and variable embedding tables.

The reference keeps one ``nn.Embedding`` per entity mode plus per-mode
variable embeddings inside the model (mpqe/encoders.py ``DirectEncoder``
and mpqe/model.py; SURVEY.md §2.1).  Here both are single global tables —
``ent [n_entities, d]`` in a global id space and ``var [n_modes, d]`` —
so lookups are plain XLA gathers and the entity table can be row-sharded
over a mesh axis without per-mode bookkeeping.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_embeddings(
    key: jax.Array,
    n_entities: int,
    n_modes: int,
    d: int,
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    # Reference init: nn.Embedding default N(0,1) scaled down; we use a
    # 1/sqrt(d) normal which keeps cosine scores in a sane range.
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype))
    return {
        "ent": jax.random.normal(k1, (n_entities, d), dtype) * scale,
        "var": jax.random.normal(k2, (n_modes, d), dtype) * scale,
    }


def embed_nodes_dense(
    emb: Dict[str, jax.Array],
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    is_var_slot: jax.Array,  # [n] float (static template mask)
) -> jax.Array:
    """Initial node features for a dense template batch: anchor slots get
    their entity row, variable/target slots the per-mode variable row."""
    x_ent = emb["ent"][node_entity]  # [B, n, d]
    x_var = emb["var"][node_mode]  # [B, n, d]
    m = is_var_slot[None, :, None].astype(x_ent.dtype)
    return x_var * m + x_ent * (1.0 - m)


def embed_nodes_template(
    emb: Dict[str, jax.Array],
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    anchor_slots,  # static tuple of ints
    n_nodes: int,  # static
    anchor_rows=None,  # [B, n_anchors, d] pre-gathered entity rows
) -> jax.Array:
    """Slot-static variant of :func:`embed_nodes_dense`: only anchor slots
    touch the (large, HBM-resident) entity table; variable/target slots
    read the tiny per-mode table.  Halves the big-table gather traffic of
    the masked version — the forward pass is HBM-bound, so this is a real
    win, and the result is identical (tested against embed_nodes_dense).

    ``anchor_rows`` (one column per anchor slot, in slot order) supplies
    pre-gathered entity rows so a caller can fuse all of a batch's table
    accesses into one gather."""
    anchors = set(anchor_slots)
    a_col = {s: k for k, s in enumerate(sorted(anchors))}
    var_table = emb["var"]
    n_modes = var_table.shape[0]
    cols = []
    for s in range(n_nodes):
        if s in anchors:
            if anchor_rows is not None:
                cols.append(anchor_rows[:, a_col[s], :])
            else:
                cols.append(emb["ent"][node_entity[:, s]])
        else:
            # one-hot MXU row selection: a row gather is transaction-
            # bound even from the tiny mode table (models/mpqe.py
            # _encode_dense_tgt_pruned measured it at ~55% of the
            # flagship forward); HIGHEST keeps the selection exact
            oh = (node_mode[:, s, None] ==
                  jnp.arange(n_modes)[None, :]).astype(jnp.float32)
            cols.append(jax.lax.dot(
                oh, var_table.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ).astype(var_table.dtype))
    return jnp.stack(cols, axis=1)  # [B, n, d]


def embed_nodes_sparse(
    emb: Dict[str, jax.Array],
    node_entity: jax.Array,  # [N] int32
    node_mode: jax.Array,  # [N] int32
    node_is_var: jax.Array,  # [N] float
) -> jax.Array:
    x_ent = emb["ent"][node_entity]
    x_var = emb["var"][node_mode]
    m = node_is_var[:, None].astype(x_ent.dtype)
    return x_var * m + x_ent * (1.0 - m)
