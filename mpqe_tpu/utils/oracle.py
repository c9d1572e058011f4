"""NumPy oracle: from-spec reference implementation for parity testing.

The reference mount was empty (SURVEY.md preamble), so per SURVEY.md §4 the
parity harness is a from-spec NumPy implementation of the R-GCN layer math
(§A.1), readouts, cosine scoring and margin loss.  Every JAX path (dense
template, sparse XLA, Pallas kernels, sharded shard_map) is checked
``allclose`` against these functions.

Everything here is deliberately naive (Python loops over edges) — clarity
over speed; it is also the "reference-spec CPU implementation" used by
bench.py to compute vs_baseline ratios.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def relation_weights_np(params: Dict[str, np.ndarray]) -> np.ndarray:
    if "w_rel" in params:
        return np.asarray(params["w_rel"])
    coeff = np.asarray(params["coeff"])
    basis = np.asarray(params["basis"])
    return np.einsum("rb,bio->rio", coeff, basis)


def rgcn_layer_np(
    x: np.ndarray,  # [N, d_in]
    params: Dict[str, np.ndarray],
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_rel: np.ndarray,
    edge_norm: np.ndarray,
    n_rels: int,
) -> np.ndarray:
    """h_i' = W0 h_i + sum_r sum_{j in N_r(i)} (1/c_{i,r}) W_r h_j + b."""
    w = relation_weights_np(params)
    out = x @ np.asarray(params["w_self"]) + np.asarray(params["bias"])
    n_nodes = x.shape[0]
    for e in range(len(edge_src)):
        r = int(edge_rel[e])
        d = int(edge_dst[e])
        if r >= n_rels or d >= n_nodes:  # padding
            continue
        out[d] += float(edge_norm[e]) * (x[int(edge_src[e])] @ w[r])
    return out


def segment_sum_np(data: np.ndarray, seg: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + data.shape[1:], dtype=data.dtype)
    for i, s in enumerate(seg):
        if 0 <= s < n:
            out[s] += data[i]
    return out


def segment_max_np(
    data: np.ndarray, seg: np.ndarray, n: int, empty_value: float = 0.0
) -> np.ndarray:
    out = np.full((n,) + data.shape[1:], -np.inf, dtype=np.float64)
    for i, s in enumerate(seg):
        if 0 <= s < n:
            out[s] = np.maximum(out[s], data[i])
    out[np.isneginf(out)] = empty_value
    return out.astype(data.dtype)


def cosine_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    bn = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    return np.sum(an * bn, axis=-1)


def margin_loss_np(
    q: np.ndarray,  # [B, d]
    ent: np.ndarray,  # [E, d]
    target: np.ndarray,
    negatives: np.ndarray,  # [B, K]
    neg_mask: np.ndarray,
    query_mask: np.ndarray,
    margin: float = 1.0,
) -> float:
    pos = cosine_np(q, ent[target])
    neg = cosine_np(q[:, None, :], ent[negatives])
    viol = np.maximum(0.0, margin - pos[:, None] + neg)
    w = neg_mask * query_mask[:, None]
    return float(np.sum(viol * w) / max(np.sum(w), 1.0))


def mpqe_forward_np(
    params,
    n_rels: int,
    readout: str,
    x0: np.ndarray,  # [N, d] initial node features
    edge_src,
    edge_dst,
    edge_rel,
    edge_norm,
    node_query,
    target_node,
    n_queries: int,
    steps: int,
) -> np.ndarray:
    """Full encoder oracle on a flattened batch (matches encode_sparse)."""
    x = x0.copy()
    for li in range(steps):
        x = rgcn_layer_np(
            x, params["layers"][li], edge_src, edge_dst, edge_rel, edge_norm, n_rels
        )
        if li < steps - 1:
            x = np.maximum(x, 0.0)
    if readout == "tgt":
        return x[np.asarray(target_node)]
    if readout == "sum":
        return segment_sum_np(x, node_query, n_queries)
    if readout == "max":
        return segment_max_np(x, node_query, n_queries)
    raise NotImplementedError(readout)


MAX_TEMPLATE_NODES = 4


def readout_concat_np(params, x_bnd: np.ndarray) -> np.ndarray:
    """CONCAT readout oracle: pad slots to 4, flatten, linear."""
    b, n, d = x_bnd.shape
    pad = np.zeros((b, MAX_TEMPLATE_NODES - n, d), x_bnd.dtype)
    flat = np.concatenate([x_bnd, pad], axis=1).reshape(b, MAX_TEMPLATE_NODES * d)
    return flat @ np.asarray(params["w_cat"]) + np.asarray(params["b_cat"])


def readout_mlp_np(params, x_bnd: np.ndarray) -> np.ndarray:
    """Deep-sets MLP readout oracle: per-node MLP, sum, outer linear."""
    h = np.maximum(
        np.einsum("bnd,do->bno", x_bnd, np.asarray(params["w_pre"]))
        + np.asarray(params["b_pre"]), 0.0)
    pooled = h.sum(axis=1)
    return pooled @ np.asarray(params["w_post"]) + np.asarray(params["b_post"])
