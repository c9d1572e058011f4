"""SPMD training: the full MPQE train step jitted over a (data, model) mesh.

Composes the parallel strategies (SURVEY.md §2.3):
  DP — batch sharded over ``data`` (grad all-reduce inserted by GSPMD)
  TP — entity table rows sharded over ``model``
  EP — relation coefficients/weights sharded over ``model``

This is the jit/GSPMD path: annotate shardings, let XLA place the
collectives on ICI.  The explicit shard_map halo path (parallel/halo.py)
covers the edge-partitioned sparse encoder; both are exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import optax
from jax.sharding import Mesh

from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.parallel import sharding as sharding_lib
from mpqe_tpu.train import loop as loop_mod


def make_spmd_train_step(
    cfg: mpqe_mod.MPQEConfig,
    tc: loop_mod.TrainConfig,
    mesh: Mesh,
    shard_entity_table: bool = True,
    shard_relations: bool = False,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn).

    init_fn(key) -> sharded TrainState-like dict
    step_fn(params, opt_state, structure, *batch) -> (params, opt_state, loss)
      with in/out shardings pinned so GSPMD keeps the entity table and
      relation weights distributed across steps.
    """
    optimizer = loop_mod.make_optimizer(tc)

    def init_fn(key):
        params = mpqe_mod.init_mpqe(key, cfg)
        p_sh = sharding_lib.param_shardings(
            params, mesh,
            shard_entity_table=shard_entity_table,
            shard_relations=shard_relations,
        )
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        opt_state = optimizer.init(params)
        return params, opt_state

    def step_fn(params, opt_state, structure, node_entity, node_mode,
                edge_rel, edge_norm, target, negatives, neg_mask, query_mask):
        def loss_fn(p):
            return mpqe_mod.dense_batch_loss(
                p, cfg, structure, node_entity, node_mode, edge_rel,
                edge_norm, target, negatives, neg_mask, query_mask,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jit_step = jax.jit(step_fn, static_argnums=(2,), donate_argnums=(0, 1))
    return init_fn, jit_step


def put_batch(mesh: Mesh, batch) -> Dict[str, jax.Array]:
    """Device-put a DenseQueryBatch's arrays with DP sharding."""
    return sharding_lib.shard_dense_batch_arrays(
        mesh,
        node_entity=batch.node_entity,
        node_mode=batch.node_mode,
        edge_rel=batch.edge_rel,
        edge_norm=batch.edge_norm,
        target=batch.target,
        negatives=batch.negatives,
        neg_mask=batch.neg_mask,
        query_mask=batch.query_mask,
    )


def spmd_train_step(jit_step, params, opt_state, mesh: Mesh, batch):
    arrays = put_batch(mesh, batch)
    return jit_step(
        params, opt_state, batch.structure,
        arrays["node_entity"], arrays["node_mode"],
        arrays["edge_rel"], arrays["edge_norm"],
        arrays["target"], arrays["negatives"],
        arrays["neg_mask"], arrays["query_mask"],
    )


def make_spmd_multistep_train_step(
    cfg: mpqe_mod.MPQEConfig,
    tc: loop_mod.TrainConfig,
    mesh: Mesh,
    shard_entity_table: bool = True,
    shard_relations: bool = False,
):
    """Sharded + scanned: K train steps per dispatch over the mesh (the
    production configuration — GSPMD shards each scanned step's batch over
    `data` and the tables over `model`; lax.scan amortizes dispatch).

    Returns (init_fn, jit_step) where jit_step takes batch arrays with a
    leading [K] axis (see train.loop.run_multistep for the stacking
    convention) and returns (params, opt_state, losses[K]).
    """
    optimizer = loop_mod.make_optimizer(tc)

    def init_fn(key):
        params = mpqe_mod.init_mpqe(key, cfg)
        p_sh = sharding_lib.param_shardings(
            params, mesh,
            shard_entity_table=shard_entity_table,
            shard_relations=shard_relations,
        )
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        return params, optimizer.init(params)

    step_fn = loop_mod.make_multistep_train_step(cfg, optimizer)
    return init_fn, step_fn
