"""On-device sparse layouts for dense template batches.

Makes the Pallas R-GCN kernels load-bearing in the TRAIN path: a dense
template batch (B same-structure queries — node_entity [B, n], edge_rel
[n_edges], edge_norm [n_edges]) fully determines the batched query graph,
so the layouts the kernels consume can be synthesized *inside* the jitted
step from iota — no per-batch host preprocessing, no HLO-constant arrays
(CLAUDE.md: large closure-captured arrays overflow the remote compile),
and one compiled executable per (structure, B) bucket exactly like the
dense path.

Two builders:

* :func:`template_chunked` — the relation-chunk-aligned layout for
  ``ops.pallas_rgcn.rgcn_sparse_fused``.  Template edge slot ``j``
  contributes B edges that all carry ``edge_rel[j]``, so laying edges out
  edge-slot-major makes every chunk single-relation *by construction* —
  no sort, and the chunk count ``n_edges * B / chunk`` is static.

* :func:`template_blocked` — the (dst-block, src-block) bucketing for
  ``ops.pallas_rgcn_blocked.rgcn_sparse_blocked``.  Choosing the node
  block as a whole number of queries (``sb = Q * n``) puts every edge's
  src and dst in the SAME block: the bucketing is purely diagonal, has
  zero padding, and is the identity permutation on query-major edge
  order.  The transpose-graph arrays the Pallas backward needs are the
  same layout with src/dst swapped.

Reference context: the reference's hot loop rebuilds a PyG ``Batch`` in
Python per step (SURVEY.md §3.2 ``get_query_graph`` — its 2nd hotspot);
here the equivalent work is a handful of iota ops fused into the step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mpqe_tpu.queries import STRUCTURES


def _iota(n: int) -> jax.Array:
    return jax.lax.iota(jnp.int32, n)


def template_chunked(
    structure: str,
    edge_rel: jax.Array,  # [n_edges] int32 — runtime relation ids
    edge_norm: jax.Array,  # [n_edges] f32
    batch_size: int,
    chunk: int = 512,
) -> Dict[str, jax.Array]:
    """Relation-chunk-aligned edge layout (ops.pallas_rgcn contract) for a
    dense template batch, built on-device.

    Edge ``(j, b)`` (template slot j, query copy b) sits at flat index
    ``j * B + b``; node ids are ``b * n + slot``.  Each chunk then spans
    one template slot => one relation.  ``chunk`` is clipped to B and must
    divide it (B buckets are powers of two >= 16, so any power-of-two
    chunk <= B works).
    """
    spec = STRUCTURES[structure]
    B, n = batch_size, spec.n_nodes
    chunk = min(chunk, B)
    if B % chunk:
        raise ValueError(f"chunk {chunk} must divide batch size {B}")
    src_slot = jnp.asarray(spec.edge_src, jnp.int32)  # [n_edges] tiny
    dst_slot = jnp.asarray(spec.edge_dst, jnp.int32)
    offs = _iota(B) * n  # [B]
    src = (src_slot[:, None] + offs[None, :]).reshape(-1)  # [E] slot-major
    dst = (dst_slot[:, None] + offs[None, :]).reshape(-1)
    norm = jnp.repeat(edge_norm.astype(jnp.float32), B)
    chunk_rel = jnp.repeat(edge_rel.astype(jnp.int32), B // chunk)
    return {"src": src, "dst": dst, "norm": norm, "chunk_rel": chunk_rel,
            "chunk": chunk}


def blocked_geometry(structure: str, batch_size: int,
                     queries_per_block: int = 512,
                     chunk: int = 512) -> Dict[str, int]:
    """Static shape parameters of the diagonal blocked layout.

    ``sb = Q * n`` (node block = Q whole queries) makes every edge
    intra-block.  Q is clipped to B; sb and chunk are kept 8-divisible
    (VMEM tile rule) and chunk must divide the per-block edge count.
    """
    spec = STRUCTURES[structure]
    B, n, ne = batch_size, spec.n_nodes, spec.n_edges
    q = min(queries_per_block, B)
    while B % q:
        q //= 2
    sb = q * n
    if sb % 8:
        # shrink Q until sb is 8-divisible (n in {2,3,4}: q multiple of 8
        # always suffices)
        while (q * n) % 8 and q > 1:
            q //= 2
        if (q * n) % 8:
            raise ValueError(f"cannot tile structure {structure} (n={n})")
        sb = q * n
    per_block = q * ne
    c = min(chunk, per_block)
    while per_block % c or c % 8:
        c //= 2
        if c < 8:
            raise ValueError(
                f"no valid chunk for {structure} B={B} Q={q}")
    return {"q_per_block": q, "node_block": sb, "chunk": c,
            "n_blocks": B // q, "chunks_per_block": per_block // c}


def template_blocked(
    structure: str,
    edge_rel: jax.Array,  # [n_edges] int32
    edge_norm: jax.Array,  # [n_edges] f32
    batch_size: int,
    queries_per_block: int = 512,
    chunk: int = 512,
) -> Dict[str, jax.Array]:
    """(dst-block, src-block) bucketed layout (ops.pallas_rgcn_blocked
    contract, including the ``t_*`` transpose arrays its Pallas backward
    consumes) for a dense template batch, built on-device.

    Query-major edge order ``(b, j)`` => every block-g bucket is the
    contiguous range ``[g*Q*ne, (g+1)*Q*ne)``; block-local node ids are
    ``(b % Q) * n + slot``.  Diagonal blocks: ``chunk_src_blk ==
    chunk_dst_blk == g``.  The transpose graph (src/dst swapped) has the
    identical geometry, so ``t_*`` arrays share everything but the two
    local-id arrays.
    """
    spec = STRUCTURES[structure]
    B, n, ne = batch_size, spec.n_nodes, spec.n_edges
    g = blocked_geometry(structure, B, queries_per_block, chunk)
    q, sb, c = g["q_per_block"], g["node_block"], g["chunk"]
    n_blocks, cpb = g["n_blocks"], g["chunks_per_block"]

    src_slot = jnp.asarray(spec.edge_src, jnp.int32)
    dst_slot = jnp.asarray(spec.edge_dst, jnp.int32)
    local_off = (_iota(B) % q) * n  # [B] block-local query offset
    src_l = (local_off[:, None] + src_slot[None, :]).reshape(-1)  # [E]
    dst_l = (local_off[:, None] + dst_slot[None, :]).reshape(-1)
    rel = jnp.tile(edge_rel.astype(jnp.int32), B)
    norm = jnp.tile(edge_norm.astype(jnp.float32), B)

    n_chunks = n_blocks * cpb
    blk = _iota(n_chunks) // cpb  # [n_chunks]
    first = (_iota(n_chunks) % cpb == 0).astype(jnp.int32)

    return {
        "src_local": src_l, "dst_local": dst_l, "rel": rel, "norm": norm,
        "chunk_src_blk": blk, "chunk_dst_blk": blk, "chunk_first": first,
        # transpose graph: swap the local-id arrays; geometry unchanged
        "t_src_local": dst_l, "t_dst_local": src_l, "t_rel": rel,
        "t_norm": norm, "t_chunk_src_blk": blk, "t_chunk_dst_blk": blk,
        "t_chunk_first": first,
        "node_block": sb, "chunk": c, "n_blocks": n_blocks,
    }
