"""mpqe_tpu — a TPU-native framework for message-passing query embedding
over knowledge graphs (MPQE-class capabilities, built from scratch).

Layering (mirrors SURVEY.md §1's decomposition, redesigned TPU-first):

  queries / graph      — query-DAG structures, KG data model (host)
  data                 — loaders, query sampler, shape-bucketed batcher
  ops                  — edge store, segment kernels, R-GCN cores (XLA+Pallas)
  models               — embeddings, readouts, MPQE model, GQE baselines
  train                — curriculum loop, losses, AUC/APR eval, checkpoints
  parallel             — mesh/shardings, edge-partitioned multi-chip path
"""

from mpqe_tpu.queries import (  # noqa: F401
    STRUCTURES,
    STRUCTURE_NAMES,
    CHAIN_STRUCTURES,
    INTERSECTION_STRUCTURES,
    Formula,
    Query,
    QueryStructure,
)
from mpqe_tpu.graph import KnowledgeGraph, make_knowledge_graph  # noqa: F401
from mpqe_tpu.models.mpqe import MPQEConfig, init_mpqe  # noqa: F401

__version__ = "0.1.0"
