"""Fused Pallas R-GCN message kernel (v2): relation-chunked basis GEMM.

The TPU replacement for the reference's torch-scatter + cuBLAS RGCNConv
inner loop (SURVEY.md §2.2).  Round 1 kept node features VMEM-resident and
gathered/scattered via one-hot matmuls — asymptotically wrong (per-chunk
overhead grew with the node count) and capped at 8192 nodes.  v2 removes
both problems by splitting the layer into its bandwidth-optimal parts:

  1. ``xs = x[src]`` — one XLA gather (TPU gathers of contiguous rows are
     already near speed-of-light; a Pallas per-row DMA loop would be
     descriptor-bound and far slower).
  2. **This kernel**: walk relation-aligned edge chunks (grid over chunks,
     double-buffered block pipeline); per chunk combine the relation
     weight from the basis in VMEM (``W = sum_b a_b V_b``, coefficients by
     scalar prefetch) and run one ``[C, d] @ [d, d]`` MXU GEMM fused with
     the edge-norm scaling.  What XLA cannot do here is exactly this
     fusion: its batched-GEMM formulation materializes the per-chunk
     ``[n_chunks, d, d]`` weights (or, basis-first, a ``[E, Bb, d]``
     gather) in HBM — at AM scale that is gigabytes of avoidable traffic.
  3. segment-sum into destinations — XLA scatter (dst-sorted within each
     relation block).

Full-weight models (``num_bases=None``) use a variant whose per-chunk
``W_r`` block is fetched straight from HBM by an index-map driven by the
scalar-prefetched chunk relation ids — no VMEM-resident weight table, so
the relation vocabulary size is unbounded.

The backward is custom-VJP: ``dxs`` reuses the same kernel with the
transposed weights (row scaling commutes with the right-matmul), ``dW``
per chunk is one XLA batched GEMM, and the node-feature gradient uses
XLA's dense scatter (measured fastest on-chip; see ``ops/embed.py``).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpqe_tpu.ops import embed as embed_ops
from mpqe_tpu.ops import segment as segment_ops
from mpqe_tpu.ops.edge_store import EdgeStore

# basis tables above this VMEM footprint switch to the HBM-blocked
# per-relation weight path (16 MB VMEM/core, leave room for blocks)
MAX_BASIS_VMEM_BYTES = 8 * 1024 * 1024

DEFAULT_CHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# Host-side: relation-aligned chunking of a sorted EdgeStore
# ----------------------------------------------------------------------
def chunk_by_relation(
    store: EdgeStore, chunk: int = DEFAULT_CHUNK
) -> Dict[str, np.ndarray]:
    """Re-pad a relation-sorted EdgeStore so every ``chunk`` edges share one
    relation.  Returns arrays src/dst/norm ``[n_chunks * chunk]`` and
    ``chunk_rel [n_chunks]`` (scalar-prefetched by the kernel; padding
    chunks get rel == n_rels)."""
    srcs, dsts, norms, crels = [], [], [], []
    pad_node = store.n_nodes  # points at the zero row
    for r in range(store.n_rels):
        lo, hi = int(store.rel_ptr[r]), int(store.rel_ptr[r + 1])
        k = hi - lo
        if k == 0:
            continue
        k_pad = _round_up(k, chunk)
        s = np.full(k_pad, pad_node, np.int32)
        d = np.full(k_pad, pad_node, np.int32)
        w = np.zeros(k_pad, np.float32)
        s[:k] = store.src[lo:hi]
        d[:k] = store.dst[lo:hi]
        w[:k] = store.norm[lo:hi]
        srcs.append(s)
        dsts.append(d)
        norms.append(w)
        crels.append(np.full(k_pad // chunk, r, np.int32))
    if not srcs:
        srcs = [np.full(chunk, pad_node, np.int32)]
        dsts = [np.full(chunk, pad_node, np.int32)]
        norms = [np.zeros(chunk, np.float32)]
        crels = [np.full(1, store.n_rels, np.int32)]
    return {
        "src": np.concatenate(srcs),
        "dst": np.concatenate(dsts),
        "norm": np.concatenate(norms),
        "chunk_rel": np.concatenate(crels),
        "chunk": chunk,
    }


# ----------------------------------------------------------------------
# Kernels
# ----------------------------------------------------------------------
def _msg_kernel_basis(ccoeff_ref, xs_ref, basis_ref, norm_ref, out_ref):
    """Per chunk: W = sum_b ccoeff[b, i] * basis[b]; out = (xs @ W) * norm.

    ``ccoeff`` is [Bb, n_chunks] — basis-major — because SMEM aligns each
    prefetched row to 512 bytes: chunk-major would cost n_chunks * 512 B
    of SMEM (over the 1 MB budget at ~2k chunks), basis-major only Bb
    rows."""
    i = pl.program_id(0)
    bb = basis_ref.shape[0]
    # static unroll: scalar * matrix accumulation (Mosaic supports neither
    # rank-1 dot_general nor 1D->3D broadcasts); coefficients arrive
    # pre-gathered + pad-masked through scalar prefetch (SMEM)
    w = ccoeff_ref[0, i] * basis_ref[0]
    for b in range(1, bb):
        w += ccoeff_ref[b, i] * basis_ref[b]
    hp = jax.lax.Precision.HIGHEST
    msg = jnp.dot(xs_ref[:], w, preferred_element_type=jnp.float32,
                  precision=hp)
    out_ref[:] = (msg * norm_ref[:]).astype(out_ref.dtype)


def _msg_kernel_wrel(crel_ref, xs_ref, w_ref, norm_ref, out_ref):
    """Per chunk: out = (xs @ W_rel[chunk_rel[i]]) * norm — the W block is
    DMA'd from HBM by the index map (crel scalar prefetch)."""
    del crel_ref  # consumed by the index map
    hp = jax.lax.Precision.HIGHEST
    msg = jnp.dot(xs_ref[:], w_ref[0], preferred_element_type=jnp.float32,
                  precision=hp)
    out_ref[:] = (msg * norm_ref[:]).astype(out_ref.dtype)


def _pad2(x: jax.Array, rows: int, cols: int) -> jax.Array:
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jax.lax.pad(
        x, jnp.asarray(0, x.dtype), ((0, rows - r, 0), (0, cols - c, 0))
    )


def _messages_pallas_basis(
    xs: jax.Array,  # [E_pad, d_in] pre-gathered source rows
    basis: jax.Array,  # [Bb, d_in, d_out]
    chunk_coeff: jax.Array,  # [n_chunks, Bb] pad-masked coefficients
    norm: jax.Array,  # [E_pad]
    chunk: int,
    interpret: bool = False,
) -> jax.Array:
    e_pad, d_in = xs.shape
    bb, _, d_out = basis.shape
    n_chunks = e_pad // chunk
    d_pad = _round_up(d_in, 128)
    do_pad = _round_up(d_out, 128)

    xs_p = _pad2(xs, e_pad, d_pad)
    basis_p = basis
    if (d_pad, do_pad) != (d_in, d_out):
        basis_p = jnp.zeros((bb, d_pad, do_pad), basis.dtype)
        basis_p = basis_p.at[:, :d_in, :d_out].set(basis)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, d_pad), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d_pad, do_pad), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, do_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _msg_kernel_basis,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, do_pad), jnp.float32),
        interpret=interpret,
    )(
        chunk_coeff.T.astype(jnp.float32),  # [Bb, n_chunks]: see kernel doc
        xs_p,
        basis_p.astype(jnp.float32),
        norm.reshape(-1, 1).astype(jnp.float32),
    )
    return out[:, :d_out]


def _messages_pallas_wrel(
    xs: jax.Array,  # [E_pad, d_in]
    w_rel: jax.Array,  # [R, d_in, d_out] (stays in HBM; blocks DMA'd)
    chunk_rel_clipped: jax.Array,  # [n_chunks] int32 in [0, R)
    norm: jax.Array,  # [E_pad]
    chunk: int,
    interpret: bool = False,
) -> jax.Array:
    e_pad, d_in = xs.shape
    r, _, d_out = w_rel.shape
    n_chunks = e_pad // chunk
    d_pad = _round_up(d_in, 128)
    do_pad = _round_up(d_out, 128)

    xs_p = _pad2(xs, e_pad, d_pad)
    w_p = w_rel
    if (d_pad, do_pad) != (d_in, d_out):
        w_p = jnp.zeros((r, d_pad, do_pad), w_rel.dtype)
        w_p = w_p.at[:, :d_in, :d_out].set(w_rel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, d_pad), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, do_pad),
                         lambda i, crel: (crel[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, do_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _msg_kernel_wrel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, do_pad), jnp.float32),
        interpret=interpret,
    )(
        chunk_rel_clipped.astype(jnp.int32),
        xs_p,
        w_p.astype(jnp.float32),
        norm.reshape(-1, 1).astype(jnp.float32),
    )
    return out[:, :d_out]


# ----------------------------------------------------------------------
# Differentiable per-edge messages (custom VJP)
# ----------------------------------------------------------------------
def _masked_chunk_coeff(coeff, chunk_rel, n_rels):
    rel_cl = jnp.clip(chunk_rel, 0, n_rels - 1)
    valid = (chunk_rel < n_rels).astype(coeff.dtype)
    return coeff[rel_cl] * valid[:, None]


def _edge_messages_xla(x, basis, coeff, src, norm, chunk_rel, n_rels, chunk):
    """Per-edge messages, composable XLA ops (backward building block +
    correctness oracle): msg_e = (x[src_e] @ W_{rel_e}) * norm_e."""
    n = x.shape[0]
    xs = x[jnp.clip(src, 0, n - 1)]
    ce = _masked_chunk_coeff(coeff, chunk_rel, n_rels)  # [n_chunks, Bb]
    xs_c = xs.reshape(-1, chunk, x.shape[1])
    # W per chunk then batched GEMM (materializes [n_chunks, d, d] — the
    # traffic the pallas kernel avoids; fine as oracle)
    w_c = jnp.einsum("cb,bio->cio", ce, basis,
                     preferred_element_type=jnp.float32)
    msg = jnp.einsum("ced,cdo->ceo", xs_c, w_c,
                     preferred_element_type=jnp.float32)
    return (msg.reshape(-1, basis.shape[-1])
            * norm[:, None].astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def rgcn_edge_messages(
    x, basis, coeff, src, norm, n_rels, chunk, interpret, chunk_rel
):
    """Per-edge messages ``[E_pad, d_out]`` through the fused kernel.

    ``src``/``norm`` are relation-chunk-aligned (chunk_by_relation);
    ``chunk_rel [n_chunks]`` carries each chunk's relation id.  For
    full-weight models pass ``coeff=None`` and the per-relation table as
    ``basis`` (shape ``[R, d_in, d_out]``).  All arguments positional
    (custom_vjp limitation).
    """
    return _edge_messages_fwd_impl(
        x, basis, coeff, src, norm, n_rels, chunk, interpret, chunk_rel
    )


def _edge_messages_fwd_impl(
    x, basis, coeff, src, norm, n_rels, chunk, interpret, chunk_rel
):
    n = x.shape[0]
    xs = x[jnp.clip(src, 0, n - 1)]
    if coeff is None:
        rel_cl = jnp.clip(chunk_rel, 0, n_rels - 1)
        return _messages_pallas_wrel(
            xs, basis, rel_cl, norm, chunk, interpret
        )
    ce = _masked_chunk_coeff(coeff, chunk_rel, n_rels)
    return _messages_pallas_basis(xs, basis, ce, norm, chunk, interpret)


def _edge_messages_fwd(
    x, basis, coeff, src, norm, n_rels, chunk, interpret, chunk_rel
):
    out = _edge_messages_fwd_impl(
        x, basis, coeff, src, norm, n_rels, chunk, interpret, chunk_rel
    )
    return out, (x, basis, coeff, src, norm, chunk_rel)


def _edge_messages_bwd(n_rels, chunk, interpret, res, g):
    x, basis, coeff, src, norm, chunk_rel = res
    n, d_in = x.shape
    src_cl = jnp.clip(src, 0, n - 1)
    xs = x[src_cl]  # regather (cheaper than saving [E, d] residuals)
    g = g.astype(jnp.float32)

    # dxs = (g * norm) @ W^T — row scaling commutes with the right-matmul,
    # so the forward kernels handle it with transposed weights
    if coeff is None:
        rel_cl = jnp.clip(chunk_rel, 0, n_rels - 1)
        w_t = basis.transpose(0, 2, 1)
        dxs = _messages_pallas_wrel(g, w_t, rel_cl, norm, chunk, interpret)
    else:
        ce = _masked_chunk_coeff(coeff, chunk_rel, n_rels)
        dxs = _messages_pallas_basis(
            g, basis.transpose(0, 2, 1), ce, norm, chunk, interpret
        )
    # measured on-chip: XLA's plain scatter beats the sorted/dedup
    # reformulations (see ops/embed.py) — use the dense scatter here too
    dx = embed_ops.scatter_add_dense(n, src_cl, dxs.astype(x.dtype))

    # per-chunk dW = xs^T @ (g * norm): one batched MXU GEMM (XLA)
    xs_c = xs.reshape(-1, chunk, d_in)
    gn_c = (g * norm[:, None]).reshape(-1, chunk, g.shape[-1])
    dw_c = jnp.einsum("ced,ceo->cdo", xs_c, gn_c,
                      preferred_element_type=jnp.float32)

    if coeff is None:
        # scatter per-chunk dW into per-relation rows
        rel_cl = jnp.clip(chunk_rel, 0, n_rels - 1)
        valid = (chunk_rel < n_rels).astype(dw_c.dtype)
        dw_rel = jax.ops.segment_sum(
            dw_c * valid[:, None, None], rel_cl,
            num_segments=basis.shape[0],
        )
        return dx, dw_rel.astype(basis.dtype), None, None, None, None

    ce = _masked_chunk_coeff(coeff, chunk_rel, n_rels)
    dbasis = jnp.einsum("cb,cdo->bdo", ce, dw_c,
                        preferred_element_type=jnp.float32)
    dcoeff_c = jnp.einsum("cdo,bdo->cb", dw_c, basis,
                          preferred_element_type=jnp.float32)
    rel_cl = jnp.clip(chunk_rel, 0, n_rels - 1)
    valid = (chunk_rel < n_rels).astype(dcoeff_c.dtype)
    dcoeff = jax.ops.segment_sum(
        dcoeff_c * valid[:, None], rel_cl, num_segments=coeff.shape[0]
    )
    return (dx, dbasis.astype(basis.dtype), dcoeff.astype(coeff.dtype),
            None, None, None)


rgcn_edge_messages.defvjp(_edge_messages_fwd, _edge_messages_bwd)


# ----------------------------------------------------------------------
# Full layer
# ----------------------------------------------------------------------
def rgcn_sparse_fused(
    x: jax.Array,
    params: Dict[str, jax.Array],
    chunked: Dict[str, jax.Array],
    n_rels: int,
    interpret: bool = False,
) -> jax.Array:
    """Full R-GCN layer: fused pallas messages + segment-sum + self-loop.

    ``chunked`` comes from :func:`chunk_by_relation` (numpy dict; arrays
    are converted on first use).  Basis models use the VMEM-resident basis
    kernel when the table fits (:data:`MAX_BASIS_VMEM_BYTES`), otherwise
    the per-relation weights are materialized once and streamed from HBM;
    full-weight models always stream.  No node-count cap.
    """
    n = x.shape[0]
    src = jnp.asarray(chunked["src"])
    dst = jnp.asarray(chunked["dst"])
    norm = jnp.asarray(chunked["norm"])
    chunk_rel = jnp.asarray(chunked["chunk_rel"])
    chunk = int(chunked["chunk"])

    if "basis" in params:
        basis, coeff = params["basis"], params["coeff"]
        bb, d_in, d_out = basis.shape
        vmem = bb * _round_up(d_in, 128) * _round_up(d_out, 128) * 4
        if vmem > MAX_BASIS_VMEM_BYTES:
            w_rel = jnp.einsum("rb,bio->rio", coeff, basis)
            msg = rgcn_edge_messages(
                x, w_rel, None, src, norm, n_rels, chunk, interpret,
                chunk_rel,
            )
        else:
            msg = rgcn_edge_messages(
                x, basis, coeff, src, norm, n_rels, chunk, interpret,
                chunk_rel,
            )
    else:
        msg = rgcn_edge_messages(
            x, params["w_rel"], None, src, norm, n_rels, chunk, interpret,
            chunk_rel,
        )
    agg = segment_ops.segment_sum(msg, dst, num_segments=n)
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + agg
        + params["bias"]
    )
