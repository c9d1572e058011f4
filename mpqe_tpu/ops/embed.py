"""Embedding-table lookup with a bandwidth-efficient backward scatter.

The reference relies on torch ``nn.Embedding`` + autograd's dense scatter
(SURVEY.md §2.1 DirectEncoder).  On TPU the naive formulation is the
single largest train-step cost: each gather's VJP materializes a
full-table ``[n_entities, d]`` zero buffer and applies hundreds of
thousands of random-row updates, and separate gathers (anchors, targets,
negatives) each build their own (round 1: ~15 of 47 ms; docs/roadmap.md).

Callers concatenate all per-batch entity indices and perform ONE lookup
(one backward scatter instead of several) — see
``models.mpqe.dense_batch_loss``.

The backward scatter strategy is selectable.  Measured on a real v5e
(tools/embed_scatter_exp.py, 917k scattered rows into a 1M x 128 table):

  dense (XLA default scatter-add)   23.7 ms   <- best, the default
  fused single scatter              25.9 ms
  argsort + sorted-scatter          32.6 ms
  argsort + segment-dedup scatter   58.0 ms

i.e. XLA's plain scatter already beats sorted/deduped reformulations on
TPU — the sort machinery costs more than duplicate handling saves.  The
variants are kept for re-benchmarking on other topologies/backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def scatter_add_dense(n_rows: int, idx: jax.Array, g: jax.Array) -> jax.Array:
    """Plain dense scatter-add (the XLA-default formulation): oracle."""
    return jnp.zeros((n_rows, g.shape[-1]), g.dtype).at[idx].add(g)


def scatter_add_sorted(n_rows: int, idx: jax.Array, g: jax.Array) -> jax.Array:
    """Sort rows by index before scattering (sorted-indices hint)."""
    order = jnp.argsort(idx)
    return jnp.zeros((n_rows, g.shape[-1]), g.dtype).at[idx[order]].add(
        g[order], indices_are_sorted=True
    )


def scatter_add_dedup(n_rows: int, idx: jax.Array, g: jax.Array) -> jax.Array:
    """Sort, segment-sum duplicate rows, scatter unique rows only.

    Static shapes throughout: the segment/unique machinery is sized to the
    worst case (every index distinct); empty tail segments scatter zero
    rows into a dropped padding row.
    """
    m, d = g.shape
    order = jnp.argsort(idx)
    idx_s = idx[order]
    g_s = g[order]
    head = jnp.concatenate([jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]])
    seg = jnp.cumsum(head) - 1  # [m], segment id per row
    sums = jax.ops.segment_sum(g_s, seg, num_segments=m)
    rep = jax.ops.segment_min(idx_s, seg, num_segments=m)  # unique row ids
    rep = jnp.clip(rep, 0, n_rows)  # empty segments: int-max -> pad row
    out = jnp.zeros((n_rows + 1, d), g.dtype).at[rep].add(
        sums, indices_are_sorted=True, unique_indices=True
    )
    return out[:n_rows]


_SCATTERS = {
    "dense": scatter_add_dense,
    "sorted": scatter_add_sorted,
    "dedup": scatter_add_dedup,
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def embedding_lookup(table: jax.Array, idx: jax.Array, grad_scatter: str = "dense"):
    """``table[idx]`` with a backward scatter chosen by ``grad_scatter``.

    ``idx`` may be any integer shape; the result is ``idx.shape + (d,)``.
    Forward is a plain XLA gather — only the VJP differs from ``table[idx]``.
    """
    return table[idx]


def _lookup_fwd(table, idx, grad_scatter):
    return table[idx], (idx, table.shape[0])


def _lookup_bwd(grad_scatter, res, g):
    idx, n_rows = res
    d = g.shape[-1]
    dtable = _SCATTERS[grad_scatter](
        n_rows, idx.reshape(-1), g.reshape(-1, d)
    )
    return dtable, None


embedding_lookup.defvjp(_lookup_fwd, _lookup_bwd)
