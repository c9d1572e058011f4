"""Shared fixture for the 2-process distributed test: deterministic model
config + per-step global batches, used identically by the worker
processes (tests/_multihost_worker.py) and the single-process oracle
(tests/test_multihost.py) so loss trajectories are directly comparable."""

import numpy as np

from mpqe_tpu.queries import STRUCTURES

N_ENT, N_MODES, N_RELS, D = 64, 2, 4, 8
N_LAYERS, BASES = 2, 2
B, N_NEG = 16, 2
STRUCT = "2-chain"
N_STEPS = 3


def model_config():
    from mpqe_tpu.models import mpqe as mpqe_mod

    return mpqe_mod.MPQEConfig(
        n_entities=N_ENT, n_modes=N_MODES, n_rels=N_RELS, embed_dim=D,
        n_layers=N_LAYERS, num_bases=BASES, readout="tgt",
    )


def train_config():
    from mpqe_tpu.train import loop as loop_mod

    return loop_mod.TrainConfig(lr=0.01, batch_size=B, n_neg=N_NEG)


def global_batches(seed: int = 0):
    """N_STEPS deterministic global dense batches (numpy dicts)."""
    spec = STRUCTURES[STRUCT]
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(N_STEPS):
        out.append(dict(
            node_entity=rng.integers(
                0, N_ENT, (B, spec.n_nodes)).astype(np.int32),
            node_mode=rng.integers(
                0, N_MODES, (B, spec.n_nodes)).astype(np.int32),
            edge_rel=rng.integers(0, N_RELS, (spec.n_edges,)).astype(np.int32),
            edge_norm=np.ones((spec.n_edges,), np.float32),
            target=rng.integers(0, N_ENT, (B,)).astype(np.int32),
            negatives=rng.integers(0, N_ENT, (B, N_NEG)).astype(np.int32),
            neg_mask=np.ones((B, N_NEG), np.float32),
            query_mask=np.ones((B,), np.float32),
        ))
    return out


BATCH_ORDER = ("node_entity", "node_mode", "edge_rel", "edge_norm",
               "target", "negatives", "neg_mask", "query_mask")
