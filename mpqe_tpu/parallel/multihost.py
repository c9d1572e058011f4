"""Multi-host initialization & data distribution helpers.

The reference is single-process (SURVEY.md §2.3).  On a TPU pod slice,
each host runs this same program; ``initialize()`` wires them into one
JAX runtime (ICI within a slice, DCN across hosts), after which the mesh
in parallel/mesh.py spans all chips and the jit/GSPMD + shard_map paths
work unchanged — XLA routes collectives over ICI first.

``host_local_batch`` builds a globally-sharded array from per-host data
(each host contributes its slice of the DP axis) via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var autodetection (TPU pods set
    everything automatically; args are for manual CPU/GPU clusters).
    Safe to call when already initialized or single-process."""
    # NOTE: must not probe jax.process_count()/jax.devices() here — those
    # initialize the XLA backend, after which distributed init is illegal
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized
    except (ImportError, AttributeError):  # pragma: no cover - private
        # API moved OR an attribute was renamed (both mean "can't probe";
        # fall through to the normal init path)
        pass
    if coordinator_address is not None:
        # explicit cluster spec: failures are real errors, never swallowed
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except Exception:
        # env-autodetect on single-process environments (tests, one host)
        pass


def host_local_batch(
    mesh: Mesh, local_arrays: dict, data_axis: str = "data"
) -> dict:
    """Per-host numpy shards -> global jax.Arrays sharded over the data
    axis.  Each host passes its own slice (global batch = concat over
    hosts in process order); per-formula scalars are replicated."""
    out = {}
    for k, v in local_arrays.items():
        v = np.asarray(v)
        if k in ("edge_rel", "edge_norm"):
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            spec = P(data_axis, *([None] * (v.ndim - 1)))
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), v
            )
    return out
