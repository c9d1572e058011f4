"""Edge-partitioned distributed R-GCN: the graph analog of sequence
parallelism (SURVEY.md §2.3, §5 "long-context analog").

The batched query graph's edges are partitioned across chips; boundary
node features are exchanged over ICI and combined with local aggregation.
Two explicit shard_map strategies, both bit-compared against the
single-device sparse path in tests:

  * ``rgcn_dst_partitioned``  (axis: data) — nodes are split into
    contiguous blocks, each edge lives on the chip owning its
    *destination*; the halo (remote source features) arrives via
    ``all_gather`` over ICI, aggregation (segment-sum) is purely local.
    This is the bandwidth-optimal direction for mean-aggregated R-GCN
    because messages reduce locally — only node features travel, never
    per-edge messages.

  * ``rgcn_rel_partitioned``  (axis: model) — the expert-parallel analog:
    each chip owns a contiguous *relation block* (its slice of the
    coefficient/weight table), computes messages for its relations only,
    and partial aggregates ``psum`` over the model axis.

Edge normalizers are computed on the full graph before partitioning, so
distribution never changes the math.  Overlapping the gather with local
compute (double-buffered Pallas ring) is layered on in ops/pallas (the
XLA scheduler already overlaps the all_gather with the independent
self-loop GEMM here).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mpqe_tpu.ops import segment as segment_ops
from mpqe_tpu.ops.edge_store import EdgeStore


# ----------------------------------------------------------------------
# Host-side partitioners
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DstPartitionedEdges:
    """Edges grouped by destination-node block, padded per part.

    Arrays are ``[n_parts, e_max]``; ``dst_local`` is relative to the
    part's node-block start; padding rows have ``rel == n_rels``,
    ``dst_local == block_size`` (dropped by segment bounds) and zero norm.
    """

    src: np.ndarray
    dst_local: np.ndarray
    rel: np.ndarray
    norm: np.ndarray
    n_parts: int
    block_size: int  # nodes per part (n_nodes padded to n_parts*block)
    n_nodes: int  # true node count
    n_rels: int

    @property
    def n_nodes_padded(self) -> int:
        return self.n_parts * self.block_size


def partition_edges_by_dst(
    store: EdgeStore, n_parts: int, pad_multiple: int = 8
) -> DstPartitionedEdges:
    block = -(-store.n_nodes // n_parts)
    m = store.pad_mask
    src, dst, rel, norm = store.src[m], store.dst[m], store.rel[m], store.norm[m]
    part = dst // block
    e_max = max(int(np.bincount(part, minlength=n_parts).max()), 1)
    e_max = ((e_max + pad_multiple - 1) // pad_multiple) * pad_multiple

    o_src = np.zeros((n_parts, e_max), dtype=np.int32)
    o_dst = np.full((n_parts, e_max), block, dtype=np.int32)
    o_rel = np.full((n_parts, e_max), store.n_rels, dtype=np.int32)
    o_norm = np.zeros((n_parts, e_max), dtype=np.float32)
    for p in range(n_parts):
        sel = part == p
        k = int(sel.sum())
        o_src[p, :k] = src[sel]
        o_dst[p, :k] = dst[sel] - p * block
        o_rel[p, :k] = rel[sel]
        o_norm[p, :k] = norm[sel]
    return DstPartitionedEdges(
        src=o_src, dst_local=o_dst, rel=o_rel, norm=o_norm,
        n_parts=n_parts, block_size=block, n_nodes=store.n_nodes,
        n_rels=store.n_rels,
    )


def pad_node_features(x: np.ndarray, pe: DstPartitionedEdges) -> np.ndarray:
    padded = np.zeros((pe.n_nodes_padded, x.shape[1]), dtype=x.dtype)
    padded[: x.shape[0]] = x
    return padded


# ----------------------------------------------------------------------
# dst-block partitioning over the `data` axis (halo = all_gather of x)
# ----------------------------------------------------------------------
def rgcn_dst_partitioned(
    mesh: Mesh,
    params: Dict[str, jax.Array],
    x_padded: jax.Array,  # [n_nodes_padded, d], sharded (data, None)
    pe_src: jax.Array,  # [n_parts, e_max]
    pe_dst_local: jax.Array,
    pe_rel: jax.Array,
    pe_norm: jax.Array,
    n_rels: int,
    axis: str = "data",
) -> jax.Array:
    """One distributed R-GCN layer; returns [n_nodes_padded, d_out] with
    the same (data, None) sharding as the input."""
    block = x_padded.shape[0] // mesh.shape[axis]

    def local_fn(p, x_local, src, dst_local, rel, norm):
        # halo exchange: collect every block's features over ICI
        x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
        src_e = src[0]
        rel_cl = jnp.clip(rel[0], 0, n_rels - 1)
        if "w_rel" in p:
            basis = p["w_rel"]
            coeff_e = jax.nn.one_hot(rel_cl, basis.shape[0], dtype=x_local.dtype)
        else:
            basis = p["basis"]
            coeff_e = p["coeff"][rel_cl]
        h_b = jnp.einsum(
            "nd,bdo->nbo", x_full, basis, preferred_element_type=jnp.float32
        )
        g = h_b[src_e]
        msg = jnp.einsum(
            "eb,ebo->eo", coeff_e, g, preferred_element_type=jnp.float32
        )
        msg = msg * norm[0][:, None].astype(msg.dtype)
        agg = segment_ops.segment_sum(msg, dst_local[0], block)
        out = (
            jnp.dot(x_local, p["w_self"], preferred_element_type=jnp.float32)
            + agg
            + p["bias"]
        )
        return out

    p_specs = jax.tree_util.tree_map(lambda _: P(), params)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(p_specs, P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(params, x_padded, pe_src, pe_dst_local, pe_rel, pe_norm)


# ----------------------------------------------------------------------
# relation-block partitioning over the `model` axis (EP analog)
# ----------------------------------------------------------------------
def rgcn_rel_partitioned(
    mesh: Mesh,
    params: Dict[str, jax.Array],
    x: jax.Array,  # [N, d] replicated
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    n_rels: int,
    axis: str = "model",
) -> jax.Array:
    """Each chip owns a relation block: computes messages for edges of its
    relations, partial segment-sums, then psum over the model axis.

    Requires per-relation weights (``w_rel`` [R, d, d] sharded on axis 0)
    or basis params with ``coeff`` sharded on axis 0 (bases replicated).
    """
    n_parts = mesh.shape[axis]
    n_nodes = x.shape[0]
    if n_rels % n_parts != 0:
        raise ValueError(
            f"n_rels {n_rels} must be divisible by model-axis size {n_parts} "
            "(pad the relation vocab)"
        )
    r_block = n_rels // n_parts

    def local_fn(w_local, x_rep, src, dst, rel, norm):
        # w_local: coeff [r_block, B] or w_rel [r_block, d, d]
        idx = jax.lax.axis_index(axis)
        lo = idx * r_block
        rel_local = rel - lo
        mine = (rel_local >= 0) & (rel_local < r_block)
        rel_cl = jnp.clip(rel_local, 0, r_block - 1)
        if w_local.ndim == 3:  # w_rel slice
            basis = w_local
            coeff_e = jax.nn.one_hot(rel_cl, r_block, dtype=x_rep.dtype)
        else:
            basis = params["basis"]
            coeff_e = w_local[rel_cl]
        coeff_e = coeff_e * mine[:, None].astype(coeff_e.dtype)
        h_b = jnp.einsum(
            "nd,bdo->nbo", x_rep, basis, preferred_element_type=jnp.float32
        )
        msg = jnp.einsum(
            "eb,ebo->eo",
            coeff_e,
            h_b[jnp.clip(src, 0, n_nodes - 1)],
            preferred_element_type=jnp.float32,
        )
        msg = msg * norm[:, None].astype(msg.dtype)
        agg = segment_ops.segment_sum(msg, dst, n_nodes)
        return jax.lax.psum(agg, axis)

    w_key = "w_rel" if "w_rel" in params else "coeff"
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(axis, *([None] * (params[w_key].ndim - 1))),
            P(), P(), P(), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    agg = fn(params[w_key], x, edge_src, edge_dst, edge_rel, edge_norm)
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + agg
        + params["bias"]
    )


# ----------------------------------------------------------------------
# combined 2-D partitioning: dst blocks (data axis) x relation blocks
# (model axis) — the full pod-slice layout
# ----------------------------------------------------------------------
def rgcn_2d_partitioned(
    mesh: Mesh,
    params: Dict[str, jax.Array],
    x_padded: jax.Array,  # [n_nodes_padded, d] sharded (data, None)
    pe_src: jax.Array,  # [n_data_parts, e_max]
    pe_dst_local: jax.Array,
    pe_rel: jax.Array,
    pe_norm: jax.Array,
    n_rels: int,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jax.Array:
    """One R-GCN layer on a (data, model) mesh: each chip owns the
    (destination-node block, relation block) tile of the edge set.  The
    halo (remote source features) all-gathers over the data axis; each
    chip aggregates messages for its relation slice only and the partial
    sums ``psum`` over the model axis.  Composes the bandwidth pattern of
    ``rgcn_dst_partitioned`` with the EP layout of
    ``rgcn_rel_partitioned``."""
    n_model = mesh.shape[model_axis]
    if n_rels % n_model != 0:
        raise ValueError(
            f"n_rels {n_rels} must divide by model axis size {n_model}"
        )
    r_block = n_rels // n_model
    block = x_padded.shape[0] // mesh.shape[data_axis]
    w_key = "w_rel" if "w_rel" in params else "coeff"

    def local_fn(w_local, others, x_local, src, dst_local, rel, norm):
        x_full = jax.lax.all_gather(x_local, data_axis, axis=0, tiled=True)
        m_idx = jax.lax.axis_index(model_axis)
        lo = m_idx * r_block
        rel_local = rel[0] - lo
        mine = (rel_local >= 0) & (rel_local < r_block)
        rel_cl = jnp.clip(rel_local, 0, r_block - 1)
        if w_local.ndim == 3:
            basis = w_local
            coeff_e = jax.nn.one_hot(rel_cl, r_block, dtype=x_local.dtype)
        else:
            basis = others["basis"]
            coeff_e = w_local[rel_cl]
        coeff_e = coeff_e * mine[:, None].astype(coeff_e.dtype)
        h_b = jnp.einsum(
            "nd,bdo->nbo", x_full, basis, preferred_element_type=jnp.float32
        )
        msg = jnp.einsum(
            "eb,ebo->eo", coeff_e, h_b[src[0]],
            preferred_element_type=jnp.float32,
        )
        msg = msg * norm[0][:, None].astype(msg.dtype)
        agg = segment_ops.segment_sum(msg, dst_local[0], block)
        agg = jax.lax.psum(agg, model_axis)
        return (
            jnp.dot(x_local, others["w_self"],
                    preferred_element_type=jnp.float32)
            + agg
            + others["bias"]
        )

    others = {k: v for k, v in params.items() if k != w_key}
    o_specs = jax.tree_util.tree_map(lambda _: P(), others)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(model_axis, *([None] * (params[w_key].ndim - 1))),
            o_specs,
            P(data_axis, None),
            P(data_axis, None), P(data_axis, None),
            P(data_axis, None), P(data_axis, None),
        ),
        out_specs=P(data_axis, None),
        check_vma=False,
    )
    return fn(params[w_key], others, x_padded,
              pe_src, pe_dst_local, pe_rel, pe_norm)


# ----------------------------------------------------------------------
# Ring-overlapped halo exchange: ppermute steps interleaved with local
# aggregation — the "overlap exchange with local aggregation" layout
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class RingPartitionedEdges:
    """Edges grouped by (destination block, SOURCE block), padded.

    Arrays are ``[n_parts, n_parts, e_max]`` (dst block, src block, edge):
    ``src_local``/``dst_local`` are block-relative.  During the ring pass,
    when the buffer holding source block ``b`` arrives at destination
    block ``p``, exactly the ``[p, b]`` edge set is aggregated — so each
    transfer step's compute is independent of the next transfer and XLA
    can overlap them (async collective permute).
    """

    src_local: np.ndarray
    dst_local: np.ndarray
    rel: np.ndarray
    norm: np.ndarray
    n_parts: int
    block_size: int
    n_nodes: int
    n_rels: int

    @property
    def n_nodes_padded(self) -> int:
        return self.n_parts * self.block_size


def partition_edges_ring(
    store: EdgeStore, n_parts: int, pad_multiple: int = 8
) -> RingPartitionedEdges:
    block = -(-store.n_nodes // n_parts)
    m = store.pad_mask
    src, dst = store.src[m], store.dst[m]
    rel, norm = store.rel[m], store.norm[m]
    dp = (dst // block).astype(np.int64)
    sp = (src // block).astype(np.int64)
    # fully vectorized bucket placement (this runs per training batch)
    key = dp * n_parts + sp
    counts = np.bincount(key, minlength=n_parts * n_parts)
    e_max = max(int(counts.max()), 1)
    e_max = ((e_max + pad_multiple - 1) // pad_multiple) * pad_multiple

    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.zeros(n_parts * n_parts, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(key_s.size, dtype=np.int64) - starts[key_s]
    flat = key_s * e_max + pos

    o_src = np.zeros((n_parts * n_parts * e_max,), np.int32)
    o_dst = np.full((n_parts * n_parts * e_max,), block, np.int32)  # dropped
    o_rel = np.full((n_parts * n_parts * e_max,), store.n_rels, np.int32)
    o_norm = np.zeros((n_parts * n_parts * e_max,), np.float32)
    o_src[flat] = (src - sp * block)[order]
    o_dst[flat] = (dst - dp * block)[order]
    o_rel[flat] = rel[order]
    o_norm[flat] = norm[order]
    shape = (n_parts, n_parts, e_max)
    return RingPartitionedEdges(
        src_local=o_src.reshape(shape), dst_local=o_dst.reshape(shape),
        rel=o_rel.reshape(shape), norm=o_norm.reshape(shape),
        n_parts=n_parts, block_size=block, n_nodes=store.n_nodes,
        n_rels=store.n_rels,
    )


def rgcn_ring_halo(
    mesh: Mesh,
    params: Dict[str, jax.Array],
    x_padded: jax.Array,  # [n_nodes_padded, d] sharded (data, None)
    pe_src_local: jax.Array,  # [P, P, e_max]
    pe_dst_local: jax.Array,
    pe_rel: jax.Array,
    pe_norm: jax.Array,
    n_rels: int,
    axis: str = "data",
) -> jax.Array:
    """One distributed R-GCN layer with ring-overlapped halo exchange.

    Instead of a monolithic all_gather, the node-feature shard circulates
    around the ring in P-1 ``ppermute`` hops; the aggregation for each
    arriving source block runs while the next hop is in flight (XLA async
    collective-permute + independent compute).  Peak communication buffer
    is one block (1/P of the all_gather footprint) — this is the
    double-buffered halo pattern of SURVEY.md §7 step 7 expressed in XLA
    collectives (a Pallas RDMA ring is a drop-in once real multi-chip
    profiling justifies it).  Bit-compared against rgcn_sparse in tests.
    """
    n_parts = mesh.shape[axis]
    block = x_padded.shape[0] // n_parts

    def local_fn(p, x_local, src_l, dst_l, rel, norm):
        my = jax.lax.axis_index(axis)
        if "w_rel" in p:
            basis = p["w_rel"]
            n_b = basis.shape[0]
            get_coeff = lambda r: jax.nn.one_hot(
                jnp.clip(r, 0, n_rels - 1), n_b, dtype=x_local.dtype
            ) * (r < n_rels)[..., None]
        else:
            basis = p["basis"]
            get_coeff = lambda r: p["coeff"][jnp.clip(r, 0, n_rels - 1)] * (
                (r < n_rels)[..., None]
            )

        perm = [(d, (d + 1) % n_parts) for d in range(n_parts)]

        def process(acc, buf, src_block):
            # edges [my, src_block]: gather rows of buf, transform, reduce
            sl = src_l[0, src_block]
            dl = dst_l[0, src_block]
            r = rel[0, src_block]
            w = norm[0, src_block]
            h_b = jnp.einsum(
                "nd,bdo->nbo", buf, basis,
                preferred_element_type=jnp.float32,
            )
            msg = jnp.einsum(
                "eb,ebo->eo", get_coeff(r),
                h_b[jnp.clip(sl, 0, block - 1)],
                preferred_element_type=jnp.float32,
            )
            msg = msg * w[:, None].astype(msg.dtype)
            return acc + segment_ops.segment_sum(msg, dl, block)

        acc = jnp.zeros((block, basis.shape[-1]), jnp.float32)
        buf = x_local
        # step 0: my own block is already here
        acc = process(acc, buf, my)
        for s in range(1, n_parts):
            buf = jax.lax.ppermute(buf, axis, perm)
            acc = process(acc, buf, (my - s) % n_parts)
        return (
            jnp.dot(x_local, p["w_self"], preferred_element_type=jnp.float32)
            + acc
            + p["bias"]
        )

    p_specs = jax.tree_util.tree_map(lambda _: P(), params)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(p_specs, P(axis, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(params, x_padded, pe_src_local, pe_dst_local, pe_rel, pe_norm)
