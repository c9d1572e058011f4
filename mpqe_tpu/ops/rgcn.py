"""Basis-decomposed relational graph convolution (R-GCN) compute cores.

The math (SURVEY.md §A.1, reference: PyG ``RGCNConv`` used by mpqe/model.py):

    h_i' = W_0 h_i + sum_r sum_{j in N_r(i)} (1 / c_{i,r}) W_r h_j + b
    W_r  = sum_b a_{r,b} V_b                      (basis decomposition)

Two TPU-native execution paths, numerically identical (tested against a
NumPy oracle and each other):

1. ``rgcn_dense_template`` — the hot path for MPQE.  A batch of B
   same-structure queries is B copies of a static template, so node
   features live in a dense ``[B, n_nodes, d]`` tensor and every template
   edge slot becomes one big ``[B, d] @ [d, d]`` MXU matmul accumulated
   into its (static) destination slot.  No gather, no scatter, no sparse
   anything — this is why the TPU rebuild is faster than the reference's
   per-batch PyG graph construction + scatter kernels.

2. ``rgcn_sparse`` — general graphs (arbitrary ``edge_type`` per edge,
   e.g. mixed-structure batches or full-KG encoding).  Basis-first
   formulation: compute per-basis node transforms ``H_b = X V_b`` (dense
   MXU GEMMs), then per-edge messages are a coefficient-weighted gather
   ``m_e = sum_b a[rel_e, b] * H_b[src_e]`` followed by a segment-sum over
   destinations.  This turns the reference's per-relation SpMM into
   static-shape GEMMs + one gather + one segment reduction — no
   relation-block ragged control flow under jit.

A fused Pallas kernel for path 2 lives in ``ops/pallas_rgcn.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from mpqe_tpu.ops import segment as segment_ops


# ----------------------------------------------------------------------
# Parameters
# ----------------------------------------------------------------------
def init_rgcn_layer(
    key: jax.Array,
    d_in: int,
    d_out: int,
    n_rels: int,
    num_bases: Optional[int] = None,
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    """Glorot-initialized R-GCN layer parameters.

    With ``num_bases=None`` the layer keeps full per-relation weights
    ``w_rel [R, d_in, d_out]``; otherwise basis matrices ``basis
    [B, d_in, d_out]`` plus coefficients ``coeff [R, B]``.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jnp.sqrt(2.0 / (d_in + d_out)).astype(dtype)
    params: Dict[str, jax.Array] = {
        "w_self": jax.random.normal(k1, (d_in, d_out), dtype) * scale,
        "bias": jnp.zeros((d_out,), dtype),
    }
    if num_bases is None:
        params["w_rel"] = jax.random.normal(k2, (n_rels, d_in, d_out), dtype) * scale
    else:
        params["basis"] = jax.random.normal(k2, (num_bases, d_in, d_out), dtype) * scale
        params["coeff"] = jax.random.normal(k3, (n_rels, num_bases), dtype) * (
            1.0 / jnp.sqrt(num_bases).astype(dtype)
        )
    return params


def relation_weights(params: Dict[str, jax.Array]) -> jax.Array:
    """Materialize ``W_r`` for all relations: ``[R, d_in, d_out]``."""
    if "w_rel" in params:
        return params["w_rel"]
    return jnp.einsum("rb,bio->rio", params["coeff"], params["basis"])


def _edge_weights(params: Dict[str, jax.Array], edge_rel: jax.Array) -> jax.Array:
    """``W_{rel_e}`` for a (small) set of edges: ``[E, d_in, d_out]``."""
    if "w_rel" in params:
        return params["w_rel"][edge_rel]
    coeff = params["coeff"][edge_rel]  # [E, B]
    return jnp.einsum("eb,bio->eio", coeff, params["basis"])


# ----------------------------------------------------------------------
# Path 1: dense structure-batched template
# ----------------------------------------------------------------------
def rgcn_dense_template(
    x: jax.Array,  # [B, n_nodes, d_in]
    params: Dict[str, jax.Array],
    edge_src: Sequence[int],  # static, len n_edges
    edge_dst: Sequence[int],  # static
    edge_rel: jax.Array,  # [n_edges] traced int32 (formula's relations)
    edge_norm: jax.Array,  # [n_edges] traced float (1/c_{dst,rel})
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """One R-GCN layer over B copies of a static query-DAG template.

    ``edge_src``/``edge_dst`` are Python ints (template structure), so the
    per-slot accumulation unrolls at trace time into n_edges MXU matmuls
    plus adds — XLA fuses the whole layer.
    """
    n_edges = len(edge_src)
    w_e = _edge_weights(params, edge_rel)  # [n_edges, d_in, d_out]
    out = jnp.einsum(
        "bnd,do->bno", x, params["w_self"], preferred_element_type=preferred_dtype
    )
    for j in range(n_edges):
        msg = jnp.einsum(
            "bd,do->bo", x[:, edge_src[j], :], w_e[j],
            preferred_element_type=preferred_dtype,
        )
        msg = msg * edge_norm[j].astype(msg.dtype)
        out = out.at[:, edge_dst[j], :].add(msg)
    return out + params["bias"]


# ----------------------------------------------------------------------
# Path 2: general sparse (basis-first gather / segment-sum)
# ----------------------------------------------------------------------
def rgcn_sparse(
    x: jax.Array,  # [N, d_in]
    params: Dict[str, jax.Array],
    edge_src: jax.Array,  # [E] int32 (padding: any value; masked via norm=0 / dst out of range)
    edge_dst: jax.Array,  # [E] int32 (padding: N)
    edge_rel: jax.Array,  # [E] int32 (padding: n_rels)
    edge_norm: jax.Array,  # [E] float (padding: 0)
    n_rels: int,
    segment_backend: str = "xla",
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """One R-GCN layer over an arbitrary padded edge list.

    Basis-first: ``H[b] = X @ V_b`` (all-MXU), per-edge message is
    ``sum_b a[rel_e, b] * H[b, src_e]`` — a gather plus a tiny contraction,
    then segment-sum into destinations.  Padded edges contribute nothing
    because ``edge_dst == N`` falls outside the segment range and
    ``edge_norm == 0``.
    """
    n_nodes = x.shape[0]
    src_c = jnp.clip(edge_src, 0, n_nodes - 1)
    if "w_rel" in params:
        # Full per-relation weights: per-edge W gather would be [E, d, d];
        # instead transform per (relation, node) only for relations present
        # is dynamic — so fall back to treating w_rel as R "bases" with
        # one-hot coefficients, which keeps everything static-shape.
        n_b = params["w_rel"].shape[0]
        basis = params["w_rel"]
        rel_cl = jnp.clip(edge_rel, 0, n_rels - 1)
        coeff_e = jax.nn.one_hot(rel_cl, n_b, dtype=x.dtype)  # [E, R]
    else:
        basis = params["basis"]
        n_b = basis.shape[0]
        rel_cl = jnp.clip(edge_rel, 0, n_rels - 1)
        coeff_e = params["coeff"][rel_cl]  # [E, B]

    # H: [N, B, d_out] — B dense GEMMs on the MXU.
    h_b = jnp.einsum("nd,bdo->nbo", x, basis, preferred_element_type=preferred_dtype)
    g = h_b[src_c]  # [E, B, d_out] gather
    msg = jnp.einsum("eb,ebo->eo", coeff_e, g, preferred_element_type=preferred_dtype)
    msg = msg * edge_norm[:, None].astype(msg.dtype)

    agg = segment_ops.segment_sum(
        msg, edge_dst, num_segments=n_nodes, backend=segment_backend
    )
    out = (
        jnp.dot(x, params["w_self"], preferred_element_type=preferred_dtype)
        + agg
        + params["bias"]
    )
    return out


def rgcn_sparse_relblock(
    x: jax.Array,
    params: Dict[str, jax.Array],
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    n_rels: int,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """Relation-gathered variant: materialize ``W_{rel_e}`` per edge.

    Memory-heavy (``[E, d, d]``) — only sensible for small E; kept as a
    second oracle for kernel tests.
    """
    n_nodes = x.shape[0]
    w = relation_weights(params)  # [R, d, d]
    rel_cl = jnp.clip(edge_rel, 0, n_rels - 1)
    w_e = w[rel_cl]  # [E, d_in, d_out]
    src_c = jnp.clip(edge_src, 0, n_nodes - 1)
    msg = jnp.einsum(
        "ed,edo->eo", x[src_c], w_e, preferred_element_type=preferred_dtype
    )
    msg = msg * edge_norm[:, None].astype(msg.dtype)
    agg = segment_ops.segment_sum(msg, edge_dst, num_segments=n_nodes)
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=preferred_dtype)
        + agg
        + params["bias"]
    )
