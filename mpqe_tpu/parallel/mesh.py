"""Device mesh construction for the distributed layer.

The reference is single-process/single-device (SURVEY.md §2.3); every
parallel strategy here is new, built on ``jax.sharding.Mesh`` + jit/
``shard_map`` with XLA collectives over ICI — axes:

  data   — query-batch (DP) and destination-node-block (graph/"sequence"
           analog) partitioning
  model  — entity-table rows (TP) and relation blocks (EP analog)

On a multi-host pod slice, call ``jax.distributed.initialize()`` before
``make_mesh`` (see parallel/multihost.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 2-D (data, model) mesh; defaults to all devices on the data axis.

    ``shape=(-1, m)`` puts m devices on the model axis and the rest on
    data.  Degrades gracefully to (1, 1) on a single chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    d, m = shape
    if d == -1:
        d = n // m
    if m == -1:
        m = n // d
    if d * m != n:
        raise ValueError(f"mesh shape {d}x{m} != {n} devices")
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names)


def data_axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]

def model_axis(mesh: Mesh) -> str:
    return mesh.axis_names[1]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
