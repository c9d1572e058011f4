"""Pallas TPU segment kernels — scatter-add / scatter-max replacements
(reference leans on torch-scatter CUDA; SURVEY.md §2.2).

TPU has no native scatter unit, so the idiomatic kernel strategies are:

  * segment-sum: one-hot matmul on the MXU.  For an edge chunk of C rows,
    ``out += onehot(ids)^T @ data`` is a ``[S, C] @ [C, d]`` systolic-array
    pass — the classic TPU scatter trick.  The sequential Pallas grid
    makes cross-chunk accumulation race-free.
  * segment-max: masked broadcast + reduce on the VPU, tiled over
    (segment-tile, edge-chunk).

Both kernels require ``num_segments`` (padded to a tile multiple) to fit
VMEM alongside a chunk — callers with huge segment counts use the XLA
backend (ops/segment.py dispatches).  Padding rows carry ids outside
``[0, num_segments)`` and are masked out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
MAX_PALLAS_SEGMENTS = 8192


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# segment sum
# ----------------------------------------------------------------------
def _segment_sum_kernel(ids_ref, data_ref, out_ref, *, n_seg_padded: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # [C, 1] int32
    c = ids.shape[0]
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (c, n_seg_padded), 1)
    onehot = (ids == seg_iota).astype(data_ref.dtype)  # [C, S]
    out_ref[:] += jnp.dot(
        onehot.T, data_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)


def segment_sum_pallas(
    data: jax.Array,  # [E, d]
    segment_ids: jax.Array,  # [E]
    num_segments: int,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    e, d = data.shape
    s_pad = _round_up(max(num_segments, 8), 8)
    if s_pad > MAX_PALLAS_SEGMENTS:
        raise ValueError(
            f"num_segments {num_segments} too large for the VMEM-resident "
            f"pallas kernel (cap {MAX_PALLAS_SEGMENTS}); use backend='xla'"
        )
    e_pad = _round_up(max(e, chunk), chunk)
    d_pad = _round_up(d, 128)
    data_p = jnp.zeros((e_pad, d_pad), data.dtype).at[:e, :d].set(data)
    # out-of-range ids (incl. padding) -> s_pad sentinel column? No column
    # exists for them: iota compare simply never matches ids >= s_pad or <0.
    ids_p = jnp.full((e_pad, 1), -1, jnp.int32).at[:e, 0].set(
        segment_ids.astype(jnp.int32)
    )
    ids_p = jnp.where(ids_p >= num_segments, -1, ids_p)

    out = pl.pallas_call(
        functools.partial(_segment_sum_kernel, n_seg_padded=s_pad),
        grid=(e_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_pad, d_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(ids_p, data_p)
    return out[:num_segments, :d].astype(data.dtype)


# ----------------------------------------------------------------------
# segment max
# ----------------------------------------------------------------------
def _segment_max_kernel(ids_ref, data_ref, out_ref, *, s_tile: int):
    e_step = pl.program_id(1)

    @pl.when(e_step == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, NEG_INF)

    s_idx = pl.program_id(0)
    ids = ids_ref[:]  # [C, 1]
    c = ids.shape[0]
    base = s_idx * s_tile
    local = ids - base  # [C, 1]
    data = data_ref[:]  # [C, d]
    # for each segment row s in tile: max over chunk rows where local == s
    for s in range(s_tile):  # static unroll (s_tile small)
        mask = (local[:, 0] == s)[:, None]  # [C, 1]
        vals = jnp.where(mask, data, NEG_INF)
        out_ref[s, :] = jnp.maximum(out_ref[s, :], jnp.max(vals, axis=0))


def segment_max_pallas(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    chunk: int = 512,
    s_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    e, d = data.shape
    s_pad = _round_up(max(num_segments, s_tile), s_tile)
    if s_pad > MAX_PALLAS_SEGMENTS:
        raise ValueError(
            f"num_segments {num_segments} too large for the pallas kernel"
        )
    e_pad = _round_up(max(e, chunk), chunk)
    d_pad = _round_up(d, 128)
    data_p = jnp.full((e_pad, d_pad), NEG_INF, data.dtype).at[:e, :d].set(data)
    ids_p = jnp.full((e_pad, 1), -1, jnp.int32).at[:e, 0].set(
        segment_ids.astype(jnp.int32)
    )
    ids_p = jnp.where(ids_p >= num_segments, -1, ids_p)

    out = pl.pallas_call(
        functools.partial(_segment_max_kernel, s_tile=s_tile),
        grid=(s_pad // s_tile, e_pad // chunk),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_tile, d_pad), lambda s, i: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(ids_p, data_p)
    return out[:num_segments, :d].astype(data.dtype)
