"""Pallas SDDMM: sampled dense-dense matmul — per-edge scores
``s_e = <x[src_e], y[dst_e]>`` (optionally through a relation matrix:
``s_e = x[src_e]^T W_{rel_e} y[dst_e]``).

The companion primitive to the fused SpMM kernel (ops/pallas_rgcn.py):
SpMM aggregates messages along edges, SDDMM scores edges — together they
cover the reference's sparse compute surface (SURVEY.md §2.2 /
BASELINE.json north star "SpMM/SDDMM kernels").  Used for edge/link
scoring (e.g. 1-chain answer scoring against explicit candidate edges)
and attention-style edge weighting.

Kernel strategy mirrors the fused R-GCN kernel: ``x``/``y`` VMEM-resident,
edge chunks gathered via one-hot MXU passes, the per-edge dot as a
row-wise multiply-reduce on the VPU.  Relation-transformed variant
combines the chunk's ``W_r`` from the basis (relation-aligned chunks via
scalar-prefetched coefficients, like pallas_rgcn).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_NODES = 8192


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sddmm_kernel(x_ref, y_ref, src_ref, dst_ref, out_ref):
    n_pad = x_ref.shape[0]
    c = src_ref.shape[0]
    hp = jax.lax.Precision.HIGHEST
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (c, n_pad), 1)
    oh_src = (src_ref[:] == node_iota).astype(x_ref.dtype)
    oh_dst = (dst_ref[:] == node_iota).astype(y_ref.dtype)
    xs = jnp.dot(oh_src, x_ref[:], preferred_element_type=jnp.float32,
                 precision=hp)
    yd = jnp.dot(oh_dst, y_ref[:], preferred_element_type=jnp.float32,
                 precision=hp)
    out_ref[:] = jnp.sum(xs * yd, axis=1, keepdims=True)


def sddmm_pallas(
    x: jax.Array,  # [N, d]
    y: jax.Array,  # [N, d] (pass x for symmetric scoring)
    src: jax.Array,  # [E] int32
    dst: jax.Array,  # [E] int32
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Per-edge dot products ``[E]``; out-of-range endpoints score against
    the zero padding row (i.e. contribute 0)."""
    n, d = x.shape
    n_pad = _round_up(n + 1, 8)
    if n_pad > MAX_PALLAS_NODES:
        raise ValueError(
            f"{n} nodes exceeds the VMEM-resident SDDMM cap "
            f"({MAX_PALLAS_NODES}); use sddmm_xla"
        )
    d_pad = _round_up(d, 128)
    e = src.shape[0]
    e_pad = _round_up(max(e, chunk), chunk)

    x_p = jnp.zeros((n_pad, d_pad), x.dtype).at[:n, :d].set(x)
    y_p = jnp.zeros((n_pad, d_pad), y.dtype).at[:n, :d].set(y)
    pad_ids = jnp.full((e_pad, 1), n_pad - 1, jnp.int32)
    src_p = pad_ids.at[:e, 0].set(src.astype(jnp.int32))
    dst_p = pad_ids.at[:e, 0].set(dst.astype(jnp.int32))

    out = pl.pallas_call(
        _sddmm_kernel,
        grid=(e_pad // chunk,),
        in_specs=[
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e_pad, 1), jnp.float32),
        interpret=interpret,
    )(x_p, y_p, src_p, dst_p)
    return out[:e, 0]


def sddmm_xla(
    x: jax.Array, y: jax.Array, src: jax.Array, dst: jax.Array
) -> jax.Array:
    """Composable XLA formulation (oracle + unbounded-size fallback)."""
    n = x.shape[0]
    xs = x[jnp.clip(src, 0, n - 1)]
    yd = y[jnp.clip(dst, 0, n - 1)]
    valid = ((src >= 0) & (src < n) & (dst >= 0) & (dst < n)).astype(x.dtype)
    return jnp.sum(xs * yd, axis=-1) * valid


def sddmm_relational_xla(
    x: jax.Array,  # [N, d]
    y: jax.Array,  # [N, d]
    w_rel: jax.Array,  # [R, d, d] (or basis-combined upstream)
    src: jax.Array,
    dst: jax.Array,
    rel: jax.Array,
    n_rels: int,
) -> jax.Array:
    """Relation-transformed edge scores ``x[src]^T W_rel y[dst]`` — the
    bilinear link-scoring form (GQE's Bilinear decoder on explicit edges).
    Basis-first: transform y once per relation? Per-edge basis gather is
    [E, d]: compute ``t_e = y[dst_e] @ W_{rel_e}^T`` via gathered weights
    only when E is small; the scalable formulation transforms per basis:
    here we take the simple composable route (oracle-grade)."""
    n = x.shape[0]
    rel_cl = jnp.clip(rel, 0, n_rels - 1)
    w_e = w_rel[rel_cl]  # [E, d, d]
    yd = y[jnp.clip(dst, 0, n - 1)]
    ty = jnp.einsum("eij,ej->ei", w_e, yd)
    xs = x[jnp.clip(src, 0, n - 1)]
    valid = ((rel >= 0) & (rel < n_rels)).astype(x.dtype)
    return jnp.sum(xs * ty, axis=-1) * valid
