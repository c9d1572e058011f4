"""Distributed full-candidate ranking over a TP-sharded entity table.

The single-chip eval sweep materializes a ``[B, n_entities]`` score
matrix (``models/mpqe.score_all_entities``) — 4 GB at B=1024 / 1M
entities, and simply impossible once the table itself is row-sharded
across a mesh (the config-5 / 10M-entity regime, where table + Adam
state already exceed one chip's HBM).  This module runs the same
ranking math under ``shard_map`` over the ``model`` axis:

* each device scores the batch against ITS table rows only
  (``[B, N/k]`` local matmul — cosine normalization is per-row, so
  shard-local normalization is exact);
* the true answer's score and mode are recovered from whichever shard
  owns the target row (owned-mask + ``psum``);
* **rank** = 1 + global count of same-mode candidates scoring strictly
  above the true answer (``psum`` of local counts) — identical
  semantics to ``train/evaluation.full_ranking``;
* **top-k** = local ``lax.top_k`` per shard, ``all_gather`` of the
  ``k`` best per shard, then a final merge top-k — the serving answer
  path for sharded tables.  When a mode has fewer than ``k`` candidates
  the tail entries come back as ``(-inf, id=-1)`` — never a real-looking
  wrong-mode or pad row.

The reference has no distributed anything (SURVEY.md §2.3); this is the
TPU-native completion of its evaluation layer (mpqe/utils.py
``eval_perc_queries`` lineage) at multi-chip scale.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from . import mesh as mesh_lib


def quantized_scores(q: jax.Array, table_t: jax.Array, table_dtype: str
                     ) -> jax.Array:
    """``q @ table_t`` under the table's dtype — THE single place the
    quantized-scoring formulas live (serve.QueryServer and the sharded
    rank/topk path both call it, so the int8/bf16 math cannot drift).

    ``q`` is f32 (normalized by the caller when cosine-scoring);
    ``table_t`` is ``[d, N]``, prepared by :func:`quantize_rows` for
    non-f32 dtypes.  int8 is calibration-free under cosine scoring:
    normalized values are [-1, 1]-bounded, symmetric scale-127 on both
    sides, int32 MXU accumulation, one rescale back to cosine units."""
    if table_dtype == "int8":
        q8 = jnp.round(jnp.clip(q, -1.0, 1.0) * 127.0).astype(jnp.int8)
        s = jnp.dot(q8, table_t, preferred_element_type=jnp.int32)
        return s.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    if table_dtype == "bfloat16":
        return jnp.dot(q.astype(jnp.bfloat16), table_t,
                       preferred_element_type=jnp.float32)
    return jnp.dot(q, table_t, preferred_element_type=jnp.float32)


def quantize_rows(ent_norm: jax.Array, table_dtype: str) -> jax.Array:
    """Quantize PRE-normalized candidate rows (shared with serve.py)."""
    if table_dtype == "bfloat16":
        return ent_norm.astype(jnp.bfloat16)
    if table_dtype == "int8":
        return jnp.round(ent_norm * 127.0).astype(jnp.int8)
    if table_dtype == "float32":
        return ent_norm
    raise ValueError(f"unknown table_dtype {table_dtype!r}")


def _local_scores(table_l: jax.Array, q: jax.Array, scale: bool,
                  table_dtype: str = "float32"):
    """[B, N_local] affinities against this shard's rows.

    Quantized dtypes expect the table PRE-normalized + quantized by
    :func:`quantize_table`; f32 tables are raw and normalize here per
    dispatch."""
    if scale:
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        if table_dtype == "float32":
            table_l = table_l / (
                jnp.linalg.norm(table_l, axis=-1, keepdims=True) + 1e-12)
    return quantized_scores(q, table_l.T, table_dtype)


def quantize_table(ent: jax.Array, table_dtype: str, scale: bool
                   ) -> jax.Array:
    """Pre-normalize (cosine) + quantize candidate rows for the sharded
    rank/topk path.  f32 returns the raw table (normalization happens
    per dispatch in :func:`_local_scores`)."""
    if table_dtype == "float32":
        return ent
    if table_dtype == "int8" and not scale:
        raise ValueError(
            "table_dtype='int8' needs cosine scoring (normalized rows)")
    if scale:
        ent = ent / (jnp.linalg.norm(ent, axis=-1, keepdims=True) + 1e-12)
    return quantize_rows(ent, table_dtype)


def make_sharded_rank_fn(mesh, cfg):
    """fn(ent_sharded, entity_mode_sharded, q, target) -> ranks [B].

    ``ent`` must be row-sharded ``P(model, None)`` and ``entity_mode``
    ``P(model)`` (pad the table to a multiple of the model-axis size
    before sharding); ``q`` [B, d] and ``target`` [B] are replicated.
    Candidates are restricted to the target's mode, exactly like
    ``full_ranking`` (other true answers still count as competitors —
    unfiltered ranking).
    """
    model = mesh_lib.model_axis(mesh)
    scale = bool(cfg.scale_scores)

    def body(table_l, mode_l, q, target):
        n_l = table_l.shape[0]
        lo = jax.lax.axis_index(model) * n_l
        scores_l = _local_scores(table_l, q, scale)  # [B, N_l]

        il = jnp.clip(target - lo, 0, n_l - 1)
        owned = ((target >= lo) & (target < lo + n_l))
        picked = jnp.take_along_axis(scores_l, il[:, None], axis=1)[:, 0]
        true_s = jax.lax.psum(
            jnp.where(owned, picked, 0.0), model)  # [B]
        t_mode = jax.lax.psum(
            jnp.where(owned, mode_l[il], 0), model)  # [B]

        mode_ok = mode_l[None, :] == t_mode[:, None]
        cnt_l = jnp.sum(
            (scores_l > true_s[:, None]) & mode_ok, axis=1)
        return 1 + jax.lax.psum(cnt_l, model)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(model, None), P(model), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_topk_fn(mesh, cfg, k: int, table_dtype: str = "float32"):
    """fn(ent_sharded, entity_mode_sharded, q, answer_mode) ->
    (scores [B, k], entity_ids [B, k]) — the serving answer path for a
    row-sharded table.  Candidates outside ``answer_mode`` score -inf
    (mirrors serve.py's mode mask).  Non-f32 ``table_dtype`` expects a
    :func:`quantize_table`-prepared table."""
    model = mesh_lib.model_axis(mesh)
    scale = bool(cfg.scale_scores)

    def body(table_l, mode_l, q, answer_mode):
        n_l = table_l.shape[0]
        lo = jax.lax.axis_index(model) * n_l
        scores_l = _local_scores(table_l, q, scale, table_dtype)
        mode_ok = mode_l[None, :] == answer_mode[:, None]
        masked = jnp.where(mode_ok, scores_l, -jnp.inf)
        kk = min(k, n_l)
        v_l, i_l = jax.lax.top_k(masked, kk)  # [B, kk] local best
        ids_l = i_l + lo
        # [S, B, kk] -> per-query merge of every shard's candidates
        v_g = jax.lax.all_gather(v_l, model)
        i_g = jax.lax.all_gather(ids_l, model)
        s = v_g.shape[0]
        v_c = jnp.moveaxis(v_g, 0, 1).reshape(v_l.shape[0], s * kk)
        i_c = jnp.moveaxis(i_g, 0, 1).reshape(v_l.shape[0], s * kk)
        v_top, sel = jax.lax.top_k(v_c, k)
        ids_top = jnp.take_along_axis(i_c, sel, axis=1)
        # fewer than k candidates of the requested mode -> the tail is
        # -inf-scored filler; return id -1 there so callers can't
        # mistake a filler (or pad) row for an answer
        return v_top, jnp.where(jnp.isfinite(v_top), ids_top, -1)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(model, None), P(model), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_encode_params(params: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Encode-side params with the entity table row-sharded over the
    model axis: rows are padded to a shard multiple first (padded rows
    are never gathered — entity ids stay < n_entities), everything else
    replicates.  The layout the spmd train step leaves the table in."""
    from . import sharding as sharding_lib

    model = mesh_lib.model_axis(mesh)
    s = mesh.shape[model]
    ent = jnp.asarray(params["emb"]["ent"], jnp.float32)
    n = ent.shape[0]
    n_pad = -(-n // s) * s
    if n_pad != n:
        ent = jnp.concatenate(
            [ent, jnp.zeros((n_pad - n, ent.shape[1]), ent.dtype)])
    emb = dict(params["emb"])
    emb["ent"] = ent
    p = dict(params)
    p["emb"] = emb
    return sharding_lib.shard_params(
        p, mesh, shard_entity_table=True, shard_relations=False)


def shard_modes(mesh, entity_mode: jax.Array, n_rows: int,
                pad_mode: int = -1) -> jax.Array:
    """Pad the mode vector to ``n_rows`` with ``pad_mode`` (matching no
    real mode, so pad table rows can never enter a rank count and only
    appear in a top-k as the ``(-inf, -1)`` filler tail) and shard it
    over the model axis."""
    model = mesh_lib.model_axis(mesh)
    n = entity_mode.shape[0]
    if n_rows != n:
        entity_mode = jnp.concatenate(
            [entity_mode,
             jnp.full((n_rows - n,), pad_mode, entity_mode.dtype)])
    return jax.device_put(entity_mode, NamedSharding(mesh, P(model)))


def shard_table(mesh, ent: jax.Array, entity_mode: jax.Array,
                pad_mode: int = -1) -> Tuple[jax.Array, jax.Array, int]:
    """Row-shard (padded) copies of the table + mode vector onto the
    model axis; returns (ent_sharded, mode_sharded, n_padded)."""
    model = mesh_lib.model_axis(mesh)
    s = mesh.shape[model]
    n = ent.shape[0]
    n_pad = -(-n // s) * s
    if n_pad != n:
        ent = jnp.concatenate(
            [ent, jnp.zeros((n_pad - n, ent.shape[1]), ent.dtype)])
    ent_s = jax.device_put(ent, NamedSharding(mesh, P(model, None)))
    mode_s = shard_modes(mesh, entity_mode, n_pad, pad_mode)
    return ent_s, mode_s, n_pad
