"""Gradient-correct distributed training THROUGH the explicit halo layers.

Round 1 tested the shard_map halo layers (parallel/halo.py) forward-only;
this module builds a full train step whose forward runs the
edge-partitioned distributed R-GCN — ``rgcn_ring_halo`` (ppermute ring,
overlapped) or ``rgcn_dst_partitioned`` (all_gather halo) — and whose
backward differentiates straight through the shard_map collectives
(ppermute/all_gather have exact transposes in JAX).  SURVEY.md §7 step 7 /
VERDICT round 1 item 3: the flagship edge-partitioned claim now trains.

Key trick: for dense template batches the batched query graph's edge
ENDPOINTS are a static function of (structure, batch size) — B tiled
copies of the template.  The (dst-block, src-block) partitioning therefore
happens at trace time in numpy; only the per-edge relation ids and norms
(which vary per formula) are traced, placed into the partition layout by a
static scatter.  The result is a drop-in replacement for
``train.loop.make_train_step`` — same signature, same batches, same
curriculum loop — selected by ``train.py --parallel halo_ring`` /
``--parallel halo_gather``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpqe_tpu.models import embeddings as emb_mod
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.models import readout as readout_mod
from mpqe_tpu.parallel import halo
from mpqe_tpu.queries import STRUCTURES
from mpqe_tpu.train import loop as loop_mod


@functools.lru_cache(maxsize=None)
def _template_layout(structure: str, batch_size: int, n_parts: int,
                     layer_kind: str):
    """Static (trace-time) partition layout for B template copies.

    Returns numpy arrays describing where each tiled template edge lands
    in the partitioned [P(, P), e_max] buckets, plus the padded node count
    and per-node static metadata.
    """
    spec = STRUCTURES[structure]
    B, n = batch_size, spec.n_nodes
    N = B * n
    block = -(-N // n_parts)
    n_pad = n_parts * block

    offs = np.arange(B, dtype=np.int64)[:, None] * n
    src = (offs + np.asarray(spec.edge_src)[None, :]).reshape(-1)
    dst = (offs + np.asarray(spec.edge_dst)[None, :]).reshape(-1)
    dp, sp = dst // block, src // block

    if layer_kind == "ring":
        key = dp * n_parts + sp
        n_buckets = n_parts * n_parts
        src_local = src - sp * block
    else:  # dst-partitioned all_gather halo: global src, local dst
        key = dp
        n_buckets = n_parts
        src_local = src
    counts = np.bincount(key, minlength=n_buckets)
    e_max = max(int(counts.max()), 1)
    e_max = ((e_max + 7) // 8) * 8
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.zeros(n_buckets, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    flat = key_s * e_max + (np.arange(key_s.size) - starts[key_s])

    total = n_buckets * e_max
    o_src = np.zeros(total, np.int32)
    o_dst = np.full(total, block, np.int32)  # out of block range: dropped
    o_src[flat] = src_local[order]
    o_dst[flat] = (dst - dp * block)[order]

    # static per-node metadata (padded)
    is_var = np.zeros((n,), np.float32)
    for s in spec.free_slots:
        is_var[s] = 1.0
    node_is_var = np.zeros(n_pad, np.float32)
    node_is_var[:N] = np.tile(is_var, B)
    node_query = np.full(n_pad, batch_size, np.int32)  # pad -> dropped
    node_query[:N] = np.repeat(np.arange(B, dtype=np.int32), n)
    target_node = (np.arange(B, dtype=np.int32) * n
                   + np.int32(spec.target_slot))
    # edge slot id of each tiled edge (to look up traced rel/norm)
    slot = np.tile(np.arange(spec.n_edges, dtype=np.int64), B)

    shape = ((n_parts, n_parts, e_max) if layer_kind == "ring"
             else (n_parts, e_max))
    return dict(
        spec=spec, n_pad=n_pad, block=block, total=total, shape=shape,
        flat=flat, slot_ordered=slot[order], o_src=o_src, o_dst=o_dst,
        node_is_var=node_is_var, node_query=node_query,
        target_node=target_node,
    )


def halo_dense_batch_loss(
    params: Dict,
    cfg: mpqe_mod.MPQEConfig,
    mesh: Mesh,
    layer_kind: str,  # "ring" | "gather"
    structure: str,
    node_entity: jax.Array,  # [B, n]
    node_mode: jax.Array,
    edge_rel: jax.Array,  # [n_edges]
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    axis: str = "data",
) -> jax.Array:
    """Same math as ``mpqe.dense_batch_loss`` with the message passing
    executed by the edge-partitioned shard_map layers."""
    B, n = node_entity.shape
    n_parts = mesh.shape[axis]
    lay = _template_layout(structure, B, n_parts, layer_kind)
    spec, n_pad = lay["spec"], lay["n_pad"]
    N = B * n

    ne = jnp.concatenate(
        [node_entity.reshape(N), jnp.zeros(n_pad - N, jnp.int32)])
    nm = jnp.concatenate(
        [node_mode.reshape(N), jnp.zeros(n_pad - N, jnp.int32)])
    x = emb_mod.embed_nodes_sparse(
        params["emb"], ne, nm, jnp.asarray(lay["node_is_var"])
    ).astype(cfg.dtype)

    # place traced per-edge rel/norm into the static partition layout
    rel_e = edge_rel[jnp.asarray(lay["slot_ordered"])]
    norm_e = edge_norm[jnp.asarray(lay["slot_ordered"])]
    flat = jnp.asarray(lay["flat"])
    rel_p = jnp.full((lay["total"],), cfg.n_rels, jnp.int32).at[flat].set(rel_e)
    norm_p = jnp.zeros((lay["total"],), jnp.float32).at[flat].set(norm_e)
    shape = lay["shape"]
    src_p = jnp.asarray(lay["o_src"]).reshape(shape)
    dst_p = jnp.asarray(lay["o_dst"]).reshape(shape)
    rel_p = rel_p.reshape(shape)
    norm_p = norm_p.reshape(shape)

    steps = mpqe_mod.num_steps(cfg, structure)
    for li in range(steps):
        lp = params["layers"][li]
        if layer_kind == "ring":
            x = halo.rgcn_ring_halo(
                mesh, lp, x, src_p, dst_p, rel_p, norm_p, cfg.n_rels,
                axis=axis,
            )
        else:
            x = halo.rgcn_dst_partitioned(
                mesh, lp, x, src_p, dst_p, rel_p, norm_p, cfg.n_rels,
                axis=axis,
            )
        x = x.astype(cfg.dtype)
        if li < steps - 1:
            x = jax.nn.relu(x)

    q = readout_mod.readout_sparse(
        cfg.readout, params["readout"], x,
        jnp.asarray(lay["node_query"]), jnp.asarray(lay["target_node"]),
        B, n_template_nodes=spec.n_nodes,
    )
    return mpqe_mod.margin_loss_from_queries(
        params, cfg, q, target, negatives, neg_mask, query_mask
    )


def make_halo_train_step(
    cfg: mpqe_mod.MPQEConfig,
    tc: loop_mod.TrainConfig,
    mesh: Mesh,
    layer_kind: str = "ring",
    axis: str = "data",
) -> Callable:
    """Drop-in for ``loop.make_train_step`` whose forward+backward run
    through the distributed halo layers (the batch itself stays replicated
    host-side; node features shard over ``axis`` inside the loss)."""
    def loss_fn(p, c, structure, *arrays):
        return halo_dense_batch_loss(
            p, c, mesh, layer_kind, structure, *arrays, axis=axis)

    return loop_mod.make_train_step(
        cfg, loop_mod.make_optimizer(tc), batch_loss_fn=loss_fn)


def make_halo_multistep_train_step(
    cfg: mpqe_mod.MPQEConfig,
    tc: loop_mod.TrainConfig,
    mesh: Mesh,
    layer_kind: str = "ring",
    axis: str = "data",
) -> Callable:
    """K halo train steps per dispatch: ``lax.scan`` over batch arrays
    with a leading [K] axis (``loop.run_multistep`` stacking convention),
    each step's forward+backward through the distributed halo layers.
    Amortizes dispatch latency K-fold for ``--parallel halo_*`` exactly
    like ``loop.make_multistep_train_step`` does for the dense step —
    and reuses its scan/jit wrapper so the dispatch convention lives in
    one place."""
    def loss_fn(p, c, structure, *arrays):
        return halo_dense_batch_loss(
            p, c, mesh, layer_kind, structure, *arrays, axis=axis)

    return loop_mod.make_multistep_train_step(
        cfg, loop_mod.make_optimizer(tc), batch_loss_fn=loss_fn)


def init_halo_train_state(
    key: jax.Array, cfg, tc: loop_mod.TrainConfig, mesh: Mesh,
    shard_entity_table: bool = False,
) -> loop_mod.TrainState:
    """Node activations, not parameters, are the sharded axis in
    edge-partitioned training — params default to replicated.

    ``shard_entity_table=True`` row-shards the (large) entity table over
    the model axis: the table is only touched OUTSIDE the shard_map
    layers (embedding lookup + loss under GSPMD, which inserts the
    collectives), while the small per-layer weights stay replicated for
    the shard_map calls — so TP composes cleanly with halo training at
    AM-scale vocab sizes."""
    params = mpqe_mod.init_mpqe(key, cfg)
    if shard_entity_table:
        from mpqe_tpu.parallel import sharding as sharding_lib

        p_sh = sharding_lib.param_shardings(
            params, mesh, shard_entity_table=True, shard_relations=False)
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    else:
        params = jax.device_put(params, NamedSharding(mesh, P()))
    optimizer = loop_mod.make_optimizer(tc)
    return loop_mod.TrainState(params=params, opt_state=optimizer.init(params))
