"""Blocked fused R-GCN layer: zero random-row HBM access (bf16 fast path).

Round-2 measurements (BASELINE.md) showed the sparse layer is bound by
random-row HBM transactions: gathering/scattering 512 B rows runs at
~40-50 GB/s regardless of dtype.  This kernel removes BOTH random
accesses by bucketing edges over (destination-node block, source-node
block) tiles — the same layout as the distributed ring partition
(parallel/halo.py), reused on a single chip:

  * the source block ``x[S]`` arrives as one contiguous BlockSpec DMA;
    per-edge rows are picked out by a one-hot matmul on the MXU
    (``onehot(src_local) @ x_S``);
  * per-edge relation weights are combined in-kernel from the basis with
    coefficients looked up by another tiny one-hot matmul
    (``onehot(rel) @ coeff``) — no [E, Bb] HBM gather;
  * messages accumulate into the VMEM-resident destination block via the
    transposed one-hot (``onehot(dst_local)^T @ msg``); the grid is
    dst-major, so each output block is initialized once, accumulated
    over its source blocks, and written out exactly once — contiguous.

The one-hot passes cost ``SB/d`` times the useful GEMM FLOPs, so the
kernel runs its matmuls in bfloat16 (one-hot matrices are exact in bf16;
accumulation stays f32).  This is the opt-in reduced-precision fast path
— the relation-chunked kernel (ops/pallas_rgcn.py) remains the full-f32
default.

The backward is Pallas end-to-end (round-3 fix: the previous XLA-twin
backward materialized an ``[E, Bb, do]`` intermediate — ~8 GB at the
kernel's own benched workload, so the "fast path" could not train at
exactly the scale it targets):

  * ``dx`` is the SAME forward kernel on the TRANSPOSE-graph bucketing
    (src/dst swapped, basis transposed) — ``dx[s] = sum_{e: src=s}
    norm_e (g[dst_e] @ W_{rel_e}^T)`` is structurally the forward with
    the roles of the two node blocks exchanged; the transpose bucketing
    is computed once on the host next to the forward one;
  * ``dbasis``/``dcoeff`` come from a second kernel over the forward
    chunks that DMAs BOTH the src x-block and the dst g-block, gathers
    per-edge rows by one-hot matmuls, and accumulates the global
    ``[Bb, d, do]`` / ``[R, Bb]`` results in VMEM across the whole grid
    (constant output index maps) — nothing edge-shaped ever touches HBM.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpqe_tpu.ops.edge_store import EdgeStore

# on-chip sweep (tools/kernel_bench.py, E=1M/N=64k/Bb=16): 2048:512 ->
# 14.4 ms, 1024:256 -> 15.8, 1024:512 -> 16.8; 512:256 compile timed out
DEFAULT_NODE_BLOCK = 2048
DEFAULT_CHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# Host-side bucketing: (dst block, src block) tiles, chunk-aligned
# ----------------------------------------------------------------------
def bucket_edges_blocked(
    store: EdgeStore,
    node_block: int = DEFAULT_NODE_BLOCK,
    chunk: int = DEFAULT_CHUNK,
    max_pad_ratio: float = 4.0,
    with_transpose: bool = True,
) -> Dict[str, np.ndarray]:
    """Bucket edges by (dst//SB, src//SB), pad each bucket to a chunk
    multiple, order buckets dst-major.  Returns flat arrays
    ``src_local/dst_local/rel/norm [n_chunks*chunk]`` plus per-chunk
    ``chunk_src_blk``, ``chunk_dst_blk``, ``chunk_first`` (1 on the first
    chunk of each dst block — the kernel's accumulator reset).

    ``with_transpose`` (default) additionally buckets the TRANSPOSE graph
    (src/dst swapped) under ``t_``-prefixed keys — the backward's ``dx``
    pass is the forward kernel on exactly that layout, so training
    through the kernel needs it (forward-only callers may skip it).

    APPLICABILITY: the layout needs dense block occupancy — roughly
    ``E >= chunk * (n_nodes / node_block)^2`` (e.g. N=64k/E>=0.5M at the
    defaults).  Sparser graphs pad explosively (measured 21x at
    N=1M/E=5.7M) and should use the relation-chunked kernel
    (ops/pallas_rgcn) instead; ``max_pad_ratio`` guards against this."""
    m = store.pad_mask
    src, dst = store.src[m], store.dst[m]
    rel, norm = store.rel[m], store.norm[m]
    out = _bucket_core(src, dst, rel, norm, store.n_nodes, store.n_rels,
                       node_block, chunk, max_pad_ratio)
    if with_transpose:
        t = _bucket_core(dst, src, rel, norm, store.n_nodes, store.n_rels,
                         node_block, chunk, max_pad_ratio)
        for k in ("src_local", "dst_local", "rel", "norm",
                  "chunk_src_blk", "chunk_dst_blk", "chunk_first"):
            out["t_" + k] = t[k]
    return out


def _bucket_core(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    norm: np.ndarray,
    n_nodes: int,
    n_rels: int,
    node_block: int,
    chunk: int,
    max_pad_ratio: float,
) -> Dict[str, np.ndarray]:
    sb = node_block
    n_blocks = -(-n_nodes // sb)
    db = (dst // sb).astype(np.int64)
    sbk = (src // sb).astype(np.int64)
    key = db * n_blocks + sbk
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    counts = np.bincount(key_s, minlength=n_blocks * n_blocks)

    # fully vectorized placement: per non-empty bucket, pad its edge
    # count to a chunk multiple; edges land at (bucket chunk base) +
    # (rank within bucket)
    nz = np.nonzero(counts)[0]  # non-empty buckets, dst-major order
    if nz.size == 0:
        nz = np.asarray([0], np.int64)
        counts = counts.copy()
        counts[0] = 0
    k_pad = (np.ceil(counts[nz] / chunk) * chunk).astype(np.int64)
    n_real = max(int(src.shape[0]), 1)
    ratio = float(k_pad.sum()) / n_real
    if ratio > max_pad_ratio:
        raise ValueError(
            f"blocked layout would pad {ratio:.1f}x ({int(k_pad.sum())} "
            f"slots for {n_real} edges): block occupancy too sparse for "
            f"node_block={sb}, chunk={chunk} at n_nodes={n_nodes} — "
            "use ops.pallas_rgcn.rgcn_sparse_fused, or raise node_block / "
            "max_pad_ratio"
        )
    bucket_base = np.zeros(nz.size, np.int64)
    np.cumsum(k_pad[:-1], out=bucket_base[1:])
    # rank of each sorted edge within its bucket
    starts = np.zeros(n_blocks * n_blocks, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(key_s.size, dtype=np.int64) - starts[key_s]
    # map each edge's bucket to its dense (non-empty) index
    bucket_of = np.full(n_blocks * n_blocks, -1, np.int64)
    bucket_of[nz] = np.arange(nz.size)
    flat = bucket_base[bucket_of[key_s]] + rank

    total = int(bucket_base[-1] + k_pad[-1]) if nz.size else 0
    o_src = np.full(total, sb, np.int32)  # padding: one-hot miss
    o_dst = np.full(total, sb, np.int32)
    o_rel = np.full(total, n_rels, np.int32)
    o_norm = np.zeros(total, np.float32)
    d_blk_e = db[order]
    s_blk_e = sbk[order]
    o_src[flat] = (src[order] - s_blk_e * sb).astype(np.int32)
    o_dst[flat] = (dst[order] - d_blk_e * sb).astype(np.int32)
    o_rel[flat] = rel[order]
    o_norm[flat] = norm[order]

    n_ch_per_bucket = (k_pad // chunk).astype(np.int64)
    c_src = np.repeat(nz % n_blocks, n_ch_per_bucket).astype(np.int32)
    c_dst = np.repeat(nz // n_blocks, n_ch_per_bucket).astype(np.int32)

    # dst blocks with NO edges still need their output zeroed: one
    # padding chunk per empty dst block (appended; each is its own
    # contiguous single-chunk run)
    present = np.unique(c_dst) if c_dst.size else np.asarray([], np.int32)
    missing = np.setdiff1d(np.arange(n_blocks, dtype=np.int32), present)
    if c_dst.size == 0 and missing.size == 0:
        missing = np.asarray([0], np.int32)
    if missing.size:
        pad_total = missing.size * chunk
        o_src = np.concatenate([o_src, np.full(pad_total, sb, np.int32)])
        o_dst = np.concatenate([o_dst, np.full(pad_total, sb, np.int32)])
        o_rel = np.concatenate(
            [o_rel, np.full(pad_total, n_rels, np.int32)])
        o_norm = np.concatenate([o_norm, np.zeros(pad_total, np.float32)])
        c_src = np.concatenate([c_src, np.zeros(missing.size, np.int32)])
        c_dst = np.concatenate([c_dst, missing])

    c_first = np.ones_like(c_dst)
    c_first[1:] = (c_dst[1:] != c_dst[:-1]).astype(c_dst.dtype)
    return {
        "src_local": o_src,
        "dst_local": o_dst,
        "rel": o_rel,
        "norm": o_norm,
        "chunk_src_blk": c_src,
        "chunk_dst_blk": c_dst,
        "chunk_first": c_first,
        "node_block": sb,
        "chunk": chunk,
        "n_blocks": n_blocks,
    }


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------
def _blocked_kernel(
    meta_ref,  # scalar prefetch: [3, n_chunks] (src_blk, dst_blk, first)
    x_ref,  # [SB, d_pad] source block (bf16)
    basis_ref,  # [Bb, d_pad, do_pad] (bf16)
    coeff_ref,  # [R_pad, Bb] (f32)
    src_ref,  # [C, 1] int32 block-local
    dst_ref,  # [C, 1]
    rel_ref,  # [C, 1]
    norm_ref,  # [C, 1] f32
    out_ref,  # [SB, do_pad] f32 accumulator (dst block)
):
    i = pl.program_id(0)

    @pl.when(meta_ref[2, i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sb = x_ref.shape[0]
    c = src_ref.shape[0]
    r_pad = coeff_ref.shape[0]
    bb = basis_ref.shape[0]
    f32 = jnp.float32

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (c, sb), 1)
    onehot_src = (src_ref[:] == node_iota).astype(jnp.bfloat16)
    xs = jnp.dot(onehot_src, x_ref[:], preferred_element_type=f32)

    rel_iota = jax.lax.broadcasted_iota(jnp.int32, (c, r_pad), 1)
    onehot_rel = (rel_ref[:] == rel_iota).astype(f32)
    coeff_e = jnp.dot(onehot_rel, coeff_ref[:], preferred_element_type=f32)

    xs16 = xs.astype(jnp.bfloat16)
    acc = jnp.zeros((c, out_ref.shape[1]), f32)
    for b in range(bb):
        h = jnp.dot(xs16, basis_ref[b], preferred_element_type=f32)
        acc += coeff_e[:, b:b + 1] * h
    acc = acc * norm_ref[:]

    onehot_dst = (dst_ref[:] == node_iota).astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(
        onehot_dst.T, acc.astype(jnp.bfloat16), preferred_element_type=f32
    )


def _messages_blocked_pallas(
    x: jax.Array,  # [N, d]
    basis: jax.Array,  # [Bb, d, do]
    coeff: jax.Array,  # [R, Bb]
    bucketed: Dict[str, np.ndarray],
    n_rels: int,
    interpret: bool = False,
) -> jax.Array:
    """Aggregated messages [n_blocks*SB, do] (no self-loop/bias)."""
    sb = int(bucketed["node_block"])
    chunk = int(bucketed["chunk"])
    n_blocks = int(bucketed["n_blocks"])
    n, d = x.shape
    bb, _, d_out = basis.shape
    d_pad = _round_up(d, 128)
    do_pad = _round_up(d_out, 128)
    r_pad = _round_up(n_rels + 1, 8)  # +1 row for the padding sentinel

    n_pad_nodes = n_blocks * sb
    x_p = jnp.zeros((n_pad_nodes, d_pad), jnp.bfloat16)
    x_p = x_p.at[:n, :d].set(x.astype(jnp.bfloat16))
    basis_p = jnp.zeros((bb, d_pad, do_pad), jnp.bfloat16)
    basis_p = basis_p.at[:, :d, :d_out].set(basis.astype(jnp.bfloat16))
    coeff_p = jnp.zeros((r_pad, bb), jnp.float32)
    coeff_p = coeff_p.at[:n_rels].set(coeff.astype(jnp.float32))

    srcs = jnp.asarray(bucketed["src_local"]).reshape(-1, 1)
    dsts = jnp.asarray(bucketed["dst_local"]).reshape(-1, 1)
    rels = jnp.asarray(bucketed["rel"]).reshape(-1, 1)
    norms = jnp.asarray(bucketed["norm"]).reshape(-1, 1)
    meta = jnp.stack([
        jnp.asarray(bucketed["chunk_src_blk"]),
        jnp.asarray(bucketed["chunk_dst_blk"]),
        jnp.asarray(bucketed["chunk_first"]),
    ]).astype(jnp.int32)  # [3, n_chunks] — few-rows-major for SMEM
    n_chunks = meta.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((sb, d_pad), lambda i, m: (m[0, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d_pad, do_pad), lambda i, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, bb), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb, do_pad), lambda i, m: (m[1, i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _blocked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad_nodes, do_pad), jnp.float32),
        interpret=interpret,
    )(meta, x_p, basis_p, coeff_p, srcs, dsts, rels, norms)
    return out[:n, :d_out]


# ----------------------------------------------------------------------
# Weight-gradient kernel: dbasis [Bb, d, do] + dcoeff [R, Bb]
# ----------------------------------------------------------------------
def _grad_kernel(
    meta_ref,  # scalar prefetch: [2, n_chunks] (src_blk, dst_blk)
    x_ref,  # [SB, d_pad] source block (bf16)
    g_ref,  # [SB, do_pad] upstream-cotangent dst block (bf16)
    basis_ref,  # [Bb, d_pad, do_pad] (bf16)
    coeff_ref,  # [R_pad, Bb] (f32)
    src_ref,  # [C, 1] int32 block-local
    dst_ref,  # [C, 1]
    rel_ref,  # [C, 1]
    norm_ref,  # [C, 1] f32
    dbasis_ref,  # [Bb, d_pad, do_pad] f32 — global accumulator
    dcoeff_ref,  # [R_pad, Bb_pad] f32 — global accumulator
):
    """Per chunk:
      dbasis[b] += xs^T @ (coeff[rel, b] * norm * gd)
      dcoeff[r, b] += sum_{e: rel=r} norm_e * <xs_e @ basis[b], gd_e>
    with xs/gd the per-edge src/dst rows gathered by one-hot matmuls.
    Output index maps are constant, so both accumulators stay VMEM-
    resident across the whole grid — no edge-shaped HBM traffic."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dbasis_ref[:] = jnp.zeros_like(dbasis_ref)
        dcoeff_ref[:] = jnp.zeros_like(dcoeff_ref)

    sb = x_ref.shape[0]
    c = src_ref.shape[0]
    r_pad = coeff_ref.shape[0]
    bb = basis_ref.shape[0]
    bb_pad = dcoeff_ref.shape[1]
    f32 = jnp.float32

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (c, sb), 1)
    onehot_src = (src_ref[:] == node_iota).astype(jnp.bfloat16)
    xs = jnp.dot(onehot_src, x_ref[:], preferred_element_type=f32)
    onehot_dst = (dst_ref[:] == node_iota).astype(jnp.bfloat16)
    gd = jnp.dot(onehot_dst, g_ref[:], preferred_element_type=f32)

    rel_iota = jax.lax.broadcasted_iota(jnp.int32, (c, r_pad), 1)
    onehot_rel = (rel_ref[:] == rel_iota).astype(f32)
    ce = jnp.dot(onehot_rel, coeff_ref[:], preferred_element_type=f32)

    gn = gd * norm_ref[:]  # padding edges have norm 0 -> contribute 0
    xs16 = xs.astype(jnp.bfloat16)
    s_cols = []
    for b in range(bb):
        h = jnp.dot(xs16, basis_ref[b], preferred_element_type=f32)
        s_cols.append(jnp.sum(h * gn, axis=1, keepdims=True))  # [C, 1]
        rhs = (ce[:, b:b + 1] * gn).astype(jnp.bfloat16)
        dbasis_ref[b] += jnp.dot(
            xs16.T, rhs, preferred_element_type=f32)
    if bb_pad > bb:  # dcoeff out block is lane-padded to 128
        s_cols.append(jnp.zeros((c, bb_pad - bb), f32))
    s = jnp.concatenate(s_cols, axis=1)  # [C, Bb_pad]
    dcoeff_ref[:] += jnp.dot(
        onehot_rel.T.astype(jnp.bfloat16), s.astype(jnp.bfloat16),
        preferred_element_type=f32)


def _grad_blocked_pallas(
    x: jax.Array,  # [N, d]
    g: jax.Array,  # [N, do] upstream cotangent
    basis: jax.Array,  # [Bb, d, do]
    coeff: jax.Array,  # [R, Bb]
    bucketed: Dict[str, jax.Array],  # FORWARD bucketing
    n_rels: int,
    interpret: bool = False,
):
    """(dbasis [Bb, d, do], dcoeff [R, Bb]) via the grad kernel."""
    sb = int(bucketed["node_block"])
    chunk = int(bucketed["chunk"])
    n_blocks = int(bucketed["n_blocks"])
    n, d = x.shape
    bb, _, d_out = basis.shape
    d_pad = _round_up(d, 128)
    do_pad = _round_up(d_out, 128)
    r_pad = _round_up(n_rels + 1, 8)
    bb_pad = _round_up(bb, 128)

    n_pad_nodes = n_blocks * sb
    x_p = jnp.zeros((n_pad_nodes, d_pad), jnp.bfloat16)
    x_p = x_p.at[:n, :d].set(x.astype(jnp.bfloat16))
    g_p = jnp.zeros((n_pad_nodes, do_pad), jnp.bfloat16)
    g_p = g_p.at[:n, :d_out].set(g.astype(jnp.bfloat16))
    basis_p = jnp.zeros((bb, d_pad, do_pad), jnp.bfloat16)
    basis_p = basis_p.at[:, :d, :d_out].set(basis.astype(jnp.bfloat16))
    coeff_p = jnp.zeros((r_pad, bb), jnp.float32)
    coeff_p = coeff_p.at[:n_rels].set(coeff.astype(jnp.float32))

    srcs = jnp.asarray(bucketed["src_local"]).reshape(-1, 1)
    dsts = jnp.asarray(bucketed["dst_local"]).reshape(-1, 1)
    rels = jnp.asarray(bucketed["rel"]).reshape(-1, 1)
    norms = jnp.asarray(bucketed["norm"]).reshape(-1, 1)
    meta = jnp.stack([
        jnp.asarray(bucketed["chunk_src_blk"]),
        jnp.asarray(bucketed["chunk_dst_blk"]),
    ]).astype(jnp.int32)
    n_chunks = meta.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((sb, d_pad), lambda i, m: (m[0, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, do_pad), lambda i, m: (m[1, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d_pad, do_pad), lambda i, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, bb), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, d_pad, do_pad), lambda i, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, bb_pad), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dbasis, dcoeff = pl.pallas_call(
        _grad_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bb, d_pad, do_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, bb_pad), jnp.float32),
        ],
        interpret=interpret,
    )(meta, x_p, g_p, basis_p, coeff_p, srcs, dsts, rels, norms)
    return dbasis[:, :d, :d_out], dcoeff[:n_rels, :bb]


# ----------------------------------------------------------------------
# Differentiable layer (Pallas backward)
# ----------------------------------------------------------------------
def _messages_xla_twin(x, basis, coeff, src_l, dst_l, rel, norm,
                       c_src, c_dst, n_rels, sb, chunk):
    """Same math in composable XLA ops (correctness oracle ONLY: it
    materializes an [E, Bb, do] intermediate, so it must never be on a
    scale path — the Pallas backward exists exactly to avoid it)."""
    n = x.shape[0]
    src = src_l + jnp.repeat(c_src, chunk) * sb
    dst = dst_l + jnp.repeat(c_dst, chunk) * sb
    src_c = jnp.clip(src, 0, n - 1)
    rel_c = jnp.clip(rel, 0, n_rels - 1)
    valid = (rel < n_rels).astype(jnp.float32)
    ce = coeff[rel_c] * valid[:, None]
    h_b = jnp.einsum("nd,bdo->nbo", x, basis,
                     preferred_element_type=jnp.float32)
    msg = jnp.einsum("eb,ebo->eo", ce, h_b[src_c],
                     preferred_element_type=jnp.float32)
    msg = msg * norm[:, None]
    return jax.ops.segment_sum(msg, dst, num_segments=n)


def _first_flags(c_dst: jax.Array) -> jax.Array:
    """first-of-dst-block flags (traced-safe: scalar-prefetch VALUES are
    runtime data, only shapes must be static)."""
    return jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (c_dst[1:] != c_dst[:-1]).astype(jnp.int32),
    ])


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _blocked_messages(x, basis, coeff, src_l, dst_l, rel, norm,
                      c_src, c_dst,
                      t_src_l, t_dst_l, t_rel, t_norm, t_c_src, t_c_dst,
                      n_rels, sb, chunk, interpret):
    """Aggregated messages [N, do].  The ``t_*`` arrays are the transpose
    -graph bucketing (bucket_edges_blocked with_transpose) consumed only
    by the backward's ``dx`` pass; the forward ignores them."""
    bucketed = {
        "src_local": src_l, "dst_local": dst_l, "rel": rel, "norm": norm,
        "chunk_src_blk": c_src, "chunk_dst_blk": c_dst,
        "chunk_first": _first_flags(c_dst),
        "node_block": sb, "chunk": chunk,
        "n_blocks": -(-x.shape[0] // sb),
    }
    return _messages_blocked_pallas(
        x, basis, coeff, bucketed, n_rels, interpret)


def _blocked_fwd(x, basis, coeff, src_l, dst_l, rel, norm, c_src, c_dst,
                 t_src_l, t_dst_l, t_rel, t_norm, t_c_src, t_c_dst,
                 n_rels, sb, chunk, interpret):
    out = _blocked_messages(
        x, basis, coeff, src_l, dst_l, rel, norm, c_src, c_dst,
        t_src_l, t_dst_l, t_rel, t_norm, t_c_src, t_c_dst,
        n_rels, sb, chunk, interpret)
    return out, (x, basis, coeff, src_l, dst_l, rel, norm, c_src, c_dst,
                 t_src_l, t_dst_l, t_rel, t_norm, t_c_src, t_c_dst)


def _blocked_bwd(n_rels, sb, chunk, interpret, res, g):
    (x, basis, coeff, src_l, dst_l, rel, norm, c_src, c_dst,
     t_src_l, t_dst_l, t_rel, t_norm, t_c_src, t_c_dst) = res
    g = g.astype(jnp.float32)

    # dx = sum_{e: src=s} norm_e (g[dst_e] @ W_{rel_e}^T): the forward
    # kernel on the transpose bucketing with the basis transposed
    n_blocks = -(-x.shape[0] // sb)
    t_bucketed = {
        "src_local": t_src_l, "dst_local": t_dst_l,
        "rel": t_rel, "norm": t_norm,
        "chunk_src_blk": t_c_src, "chunk_dst_blk": t_c_dst,
        "chunk_first": _first_flags(t_c_dst),
        "node_block": sb, "chunk": chunk, "n_blocks": n_blocks,
    }
    dx = _messages_blocked_pallas(
        g, basis.transpose(0, 2, 1), coeff, t_bucketed, n_rels, interpret)

    fwd_bucketed = {
        "src_local": src_l, "dst_local": dst_l, "rel": rel, "norm": norm,
        "chunk_src_blk": c_src, "chunk_dst_blk": c_dst,
        "node_block": sb, "chunk": chunk, "n_blocks": n_blocks,
    }
    dbasis, dcoeff = _grad_blocked_pallas(
        x, g, basis, coeff, fwd_bucketed, n_rels, interpret)
    return (dx.astype(x.dtype), dbasis.astype(basis.dtype),
            dcoeff.astype(coeff.dtype),
            None, None, None, None, None, None,
            None, None, None, None, None, None)


_blocked_messages.defvjp(_blocked_fwd, _blocked_bwd)


def rgcn_sparse_blocked(
    x: jax.Array,
    params: Dict[str, jax.Array],
    bucketed: Dict[str, np.ndarray],
    n_rels: int,
    interpret: bool = False,
) -> jax.Array:
    """Full R-GCN layer through the blocked bf16 kernel (basis models).

    ``bucketed`` comes from :func:`bucket_edges_blocked`.  Messages are
    bf16-matmul / f32-accumulate — expect ~1e-2 relative deviation from
    the f32 paths; use ``ops.pallas_rgcn.rgcn_sparse_fused`` where exact
    f32 parity matters.
    """
    if "basis" not in params:
        raise ValueError(
            "rgcn_sparse_blocked requires basis decomposition; use "
            "rgcn_sparse_fused for full-weight models"
        )
    if "t_src_local" not in bucketed:
        raise ValueError(
            "bucketed dict lacks the transpose layout needed by the "
            "backward; re-run bucket_edges_blocked(with_transpose=True)"
        )
    agg = _blocked_messages(
        x, params["basis"], params["coeff"],
        jnp.asarray(bucketed["src_local"]),
        jnp.asarray(bucketed["dst_local"]),
        jnp.asarray(bucketed["rel"]), jnp.asarray(bucketed["norm"]),
        jnp.asarray(bucketed["chunk_src_blk"]),
        jnp.asarray(bucketed["chunk_dst_blk"]),
        jnp.asarray(bucketed["t_src_local"]),
        jnp.asarray(bucketed["t_dst_local"]),
        jnp.asarray(bucketed["t_rel"]), jnp.asarray(bucketed["t_norm"]),
        jnp.asarray(bucketed["t_chunk_src_blk"]),
        jnp.asarray(bucketed["t_chunk_dst_blk"]),
        n_rels, int(bucketed["node_block"]), int(bucketed["chunk"]),
        interpret,
    )
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + agg
        + params["bias"]
    )
