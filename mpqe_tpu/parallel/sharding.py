"""Sharding policies: parameters and batches onto the (data, model) mesh.

Strategy (SURVEY.md §2.3's target inventory):

  * DP   — dense query batches shard their leading (query) axis over
           ``data``; gradients all-reduce automatically under jit.
  * TP   — the entity embedding table (the dominant parameter at AM/Bio
           scale: ~1M x 128) shards rows over ``model``; lookups become
           XLA gathers with collectives inserted by the partitioner.
  * EP   — per-relation weights / basis coefficients shard their relation
           axis over ``model`` (relation blocks behave like experts).

All policies are expressed as NamedShardings applied with
``jax.device_put`` / jit ``out_shardings`` — XLA GSPMD inserts the
collectives; the explicit shard_map halo path lives in parallel/halo.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpqe_tpu.parallel import mesh as mesh_lib


def param_shardings(
    params: Dict[str, Any],
    mesh: Mesh,
    shard_entity_table: bool = True,
    shard_relations: bool = True,
) -> Dict[str, Any]:
    """A pytree of NamedShardings matching an MPQE parameter pytree."""
    model = mesh_lib.model_axis(mesh)
    rep = P()

    def spec_for(path: str, leaf) -> P:
        if shard_entity_table and path.endswith("emb/ent"):
            return P(model, None)  # row-shard the entity table
        if shard_relations and (
            path.endswith("w_rel") or path.endswith("coeff")
        ):
            return P(model, *([None] * (leaf.ndim - 1)))
        return rep

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = type(tree)
            return t(walk(v, f"{prefix}/{i}") for i, v in enumerate(tree))
        return NamedSharding(mesh, spec_for(prefix, tree))

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh, **kw) -> Dict[str, Any]:
    shardings = param_shardings(params, mesh, **kw)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Dense batch arrays: [B, ...] sharded over data; per-formula scalars
    (edge_rel/edge_norm, [n_edges]) replicated."""
    data = mesh_lib.data_axis(mesh)
    b = NamedSharding(mesh, P(data))
    rep = NamedSharding(mesh, P())
    return {
        "node_entity": b, "node_mode": b, "target": b, "negatives": b,
        "neg_mask": b, "query_mask": b, "edge_rel": rep, "edge_norm": rep,
    }


def shard_dense_batch_arrays(
    mesh: Mesh, **arrays: jax.Array
) -> Dict[str, jax.Array]:
    sh = batch_shardings(mesh)
    return {
        k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in arrays.items()
    }
