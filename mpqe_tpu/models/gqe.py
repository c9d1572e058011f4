"""GQE baseline models: metapath composition + set intersection.

The reference retains the GQE (Hamilton et al. 2018) baselines alongside
MPQE: metapath decoders (mpqe/decoders.py — ``BilinearMetapathDecoder``,
``BilinearDiagMetapathDecoder``, ``TransEMetapathDecoder``) and set
intersections (``SimpleSetIntersection``, ``SetIntersection``) wired by
``QueryEncoderDecoder`` / ``SoftAndEncoderDecoder`` (mpqe/model.py); see
SURVEY.md §2.1.  Rebuilt here TPU-first over the same dense template
batches the MPQE encoder uses — per template edge slot the relation
composition is a batched gather + MXU matmul (bilinear) or VPU op
(TransE/DistMult), unrolled statically over the ≤4-node template.

Query evaluation walks template nodes in slot order (templates guarantee
``edge_src < edge_dst``): each node's representation is the intersection
of its incoming-edge compositions; the target node's representation scores
against candidate entities by cosine.  ``SoftAnd`` instead scores each
conjunct separately and takes the minimum score (soft conjunction).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from mpqe_tpu.models import embeddings as emb_mod
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import STRUCTURES

DECODERS = ("bilinear", "transe", "distmult", "box", "bibox")
INTERSECTIONS = ("min", "mean", "deepsets")
ENCODERS = ("direct", "neighborhood")


@dataclasses.dataclass(frozen=True)
class GQEConfig:
    n_entities: int
    n_modes: int
    n_rels: int
    embed_dim: int = 128
    decoder: str = "bilinear"
    intersection: str = "deepsets"
    soft_and: bool = False  # SoftAndEncoderDecoder scoring
    # anchor entity encoder (reference mpqe/encoders.py Encoder +
    # aggregators.py): "direct" = embedding lookup; "neighborhood" =
    # GraphSAGE-style combine(self, agg(sampled neighbors)) over a fixed
    # -fanout table (models/aggregators.py) passed as ``neighbor_table``
    encoder: str = "direct"
    aggregator: str = "mean"  # mean | max | pool (neighborhood encoder)
    margin: float = 1.0
    scale_scores: bool = True
    # box decoder (Query2Box geometry, Ren et al. 2020 — NOT in the
    # reference; added round 5 against the measured hard-negative
    # generalization limit of vector+cosine scoring, docs/quality/
    # quality5_hard_train.md): weight of the inside-box distance term
    box_alpha: float = 0.02
    # hybrid decoder "bibox" (round 5): one model carries BOTH a
    # bilinear point head (plain-APR strength, quality5 GQE 2M arm) and
    # a box head (hard-negative robustness, quality5 box 2M arm) over a
    # SHARED entity table; the fused score is
    #   cosine(vec, e) + bibox_w * box_affinity(c, o, e)
    # bibox_w weights the box-distance term against the cosine term
    bibox_w: float = 1.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.decoder not in DECODERS:
            raise ValueError(f"decoder {self.decoder}")
        if self.intersection not in INTERSECTIONS:
            raise ValueError(f"intersection {self.intersection}")
        if self.encoder not in ENCODERS:
            raise ValueError(f"encoder {self.encoder}")
        from mpqe_tpu.models import aggregators as agg_mod

        if self.aggregator not in agg_mod.AGGREGATORS:
            raise ValueError(f"aggregator {self.aggregator}")


def init_gqe(key: jax.Array, cfg: GQEConfig) -> Dict[str, Any]:
    k_emb, k_dec, k_i1, k_i2, k_nbr = jax.random.split(key, 5)
    d, r = cfg.embed_dim, cfg.n_rels
    params: Dict[str, Any] = {
        "emb": emb_mod.init_embeddings(
            k_emb, cfg.n_entities, cfg.n_modes, d, cfg.dtype
        )
    }
    if cfg.encoder == "neighborhood":
        from mpqe_tpu.models import aggregators as agg_mod

        params["nbr"] = agg_mod.init_neighborhood_encoder(
            k_nbr, d, cfg.aggregator, cfg.dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, cfg.dtype))
    if cfg.decoder in ("bilinear", "bibox"):
        # near-identity init keeps deep compositions stable
        k_bil = (jax.random.fold_in(k_dec, 1)
                 if cfg.decoder == "bibox" else k_dec)
        eye = jnp.eye(d, dtype=cfg.dtype)
        noise = jax.random.normal(k_bil, (r, d, d), cfg.dtype) * (0.1 * scale)
        params["rel_mat"] = eye[None, :, :] + noise
    if cfg.decoder == "transe":
        params["rel_vec"] = jax.random.normal(k_dec, (r, d), cfg.dtype) * scale
    if cfg.decoder in ("box", "bibox"):
        # Query2Box geometry: a relation hop translates the box center
        # and widens the (nonnegative) offset; anchors are zero-volume
        # boxes at their embedding.  Offsets init small relative to the
        # 1/sqrt(d) embedding scale so boxes start tight (a box that
        # covers everything has zero outside-distance gradient).
        k_off, k_a1, k_a2, k_d1, k_d2 = jax.random.split(k_dec, 5)
        params["rel_cen"] = jax.random.normal(
            k_dec, (r, d), cfg.dtype) * scale
        params["rel_off"] = jax.random.uniform(
            k_off, (r, d), cfg.dtype, 0.0, 0.5) * scale
        s2 = jnp.sqrt(2.0 / (2 * d)).astype(cfg.dtype)
        # center intersection: per-dim attention over branch centers
        params["box_att1"] = jax.random.normal(k_a1, (d, d), cfg.dtype) * s2
        params["box_att1_b"] = jnp.zeros((d,), cfg.dtype)
        params["box_att2"] = jax.random.normal(k_a2, (d, d), cfg.dtype) * s2
        params["box_att2_b"] = jnp.zeros((d,), cfg.dtype)
        # offset intersection: min(offsets) * sigmoid(DeepSets([c; o]))
        params["box_ds1"] = jax.random.normal(k_d1, (2 * d, d), cfg.dtype) * s2
        params["box_ds1_b"] = jnp.zeros((d,), cfg.dtype)
        params["box_ds2"] = jax.random.normal(k_d2, (d, d), cfg.dtype) * s2
        params["box_ds2_b"] = jnp.zeros((d,), cfg.dtype)
    if cfg.decoder == "distmult":
        params["rel_diag"] = 1.0 + jax.random.normal(
            k_dec, (r, d), cfg.dtype
        ) * (0.1 * scale)
    if cfg.intersection == "deepsets":
        s2 = jnp.sqrt(2.0 / (2 * d)).astype(cfg.dtype)
        params["int_pre"] = jax.random.normal(k_i1, (d, d), cfg.dtype) * s2
        params["int_pre_b"] = jnp.zeros((d,), cfg.dtype)
        params["int_post"] = jax.random.normal(k_i2, (d, d), cfg.dtype) * s2
        params["int_post_b"] = jnp.zeros((d,), cfg.dtype)
    return params


def _compose(
    cfg: GQEConfig, params: Dict[str, Any], vec: jax.Array, rel: jax.Array
) -> jax.Array:
    """Apply one relation hop to a batch of vectors ``[B, d]``; ``rel`` is
    either a traced scalar relation id (shared across a same-formula
    batch) or a per-query ``[B]`` vector (mixed-formula batches — the
    batched eval/serving sweep)."""
    if cfg.decoder in ("bilinear", "bibox"):
        w = params["rel_mat"][rel]  # [d, d] or [B, d, d]
        if w.ndim == 3:
            return jnp.einsum(
                "bd,bdo->bo", vec, w, preferred_element_type=jnp.float32
            ).astype(vec.dtype)
        return jnp.dot(vec, w, preferred_element_type=jnp.float32).astype(vec.dtype)
    if cfg.decoder == "transe":
        return vec + params["rel_vec"][rel]  # [d] / [B, d] both broadcast
    return vec * params["rel_diag"][rel]  # distmult


def _intersect(
    cfg: GQEConfig, params: Dict[str, Any], branches: List[jax.Array]
) -> jax.Array:
    if len(branches) == 1:
        return branches[0]
    stack = jnp.stack(branches, axis=0)  # [K, B, d]
    if cfg.intersection == "min":
        return jnp.min(stack, axis=0)
    if cfg.intersection == "mean":
        return jnp.mean(stack, axis=0)
    h = jax.nn.relu(
        jnp.einsum("kbd,do->kbo", stack, params["int_pre"]) + params["int_pre_b"]
    )
    pooled = jnp.min(h, axis=0)
    return jnp.dot(pooled, params["int_post"]) + params["int_post_b"]


def _compose_box(cfg, params, box, rel):
    """One relation hop on a batch of boxes: translate the center, widen
    the offset (Query2Box projection; relu keeps offsets nonnegative
    even if the raw parameters drift below zero)."""
    c, o = box
    return (c + params["rel_cen"][rel],
            o + jax.nn.relu(params["rel_off"][rel]))


def _intersect_box(cfg, params, boxes):
    """Query2Box intersection: per-dim attention over branch centers;
    offsets shrink to min(offsets) * sigmoid(DeepSets([center; offset]))
    — the intersected box is inside every branch box."""
    if len(boxes) == 1:
        return boxes[0]
    cs = jnp.stack([b[0] for b in boxes], axis=0)  # [K, B, d]
    os_ = jnp.stack([b[1] for b in boxes], axis=0)
    att = jax.nn.relu(
        jnp.einsum("kbd,do->kbo", cs, params["box_att1"])
        + params["box_att1_b"])
    att = (jnp.einsum("kbd,do->kbo", att, params["box_att2"])
           + params["box_att2_b"])
    a = jax.nn.softmax(att, axis=0)
    c = jnp.sum(a * cs, axis=0)
    x = jnp.concatenate([cs, os_], axis=-1)  # [K, B, 2d]
    h = jax.nn.relu(
        jnp.einsum("kbe,eo->kbo", x, params["box_ds1"])
        + params["box_ds1_b"])
    g = jax.nn.sigmoid(
        jnp.dot(jnp.mean(h, axis=0), params["box_ds2"])
        + params["box_ds2_b"])
    return (c, jnp.min(os_, axis=0) * g)


def _compose_bibox(cfg, params, rep, rel):
    """One relation hop on a batch of hybrid ``(vec, (center, offset))``
    representations: the bilinear head and the box head advance in
    lockstep over the shared query structure."""
    vec, box = rep
    return (_compose(cfg, params, vec, rel),
            _compose_box(cfg, params, box, rel))


def _intersect_bibox(cfg, params, reps):
    """Hybrid intersection: DeepSets on the point head, Query2Box
    attention/shrink on the box head — each head keeps its own native
    conjunction geometry."""
    if len(reps) == 1:
        return reps[0]
    return (_intersect(cfg, params, [r[0] for r in reps]),
            _intersect_box(cfg, params, [r[1] for r in reps]))


def bibox_score(cfg: GQEConfig, rep, e: jax.Array) -> jax.Array:
    """Fused hybrid affinity: ``cosine(vec, e) + bibox_w * box(c,o,e)``.
    ``e`` may carry one extra leading candidate axis relative to the
    ``[B, d]`` representation (``[B, K, d]`` / ``[1, K, d]`` sweeps) —
    the query side broadcasts over it, matching ``box_score_rows``."""
    vec, (c, o) = rep
    if e.ndim == vec.ndim + 1:
        vec, c, o = vec[:, None, :], c[:, None, :], o[:, None, :]
    return (mpqe_mod.score(_score_cfg(cfg), vec, e)
            + cfg.bibox_w * box_score(cfg, c, o, e))


def bibox_score_rows(cfg: GQEConfig, rep, rows: jax.Array) -> jax.Array:
    """Hybrid scores of a ``(vec, box)`` batch against shared candidate
    rows ``[K, d]`` → ``[B, K]`` (batch-shared sweep analog)."""
    return bibox_score(cfg, rep, rows[None, :, :])


def bibox_score_all(params, cfg: GQEConfig, rep, chunk: int = 8192
                    ) -> jax.Array:
    """``[B, n_entities]`` hybrid affinities: one MXU cosine matmul for
    the point head + the chunk-scanned box distance for the box head."""
    vec, box = rep
    return (mpqe_mod.score_all_entities(params, _score_cfg(cfg), vec)
            + cfg.bibox_w * box_score_all(params, cfg, box, chunk))


def box_score(cfg: GQEConfig, c: jax.Array, o: jax.Array,
              e: jax.Array) -> jax.Array:
    """Query2Box affinity of entity points ``e`` to box ``(c, o)``
    (broadcasting over leading dims): −(outside L1 + α·inside L1),
    scaled by 1/sqrt(d) so margins stay in the cosine-score range the
    shared protocol uses."""
    delta = jnp.abs(e.astype(jnp.float32) - c.astype(jnp.float32))
    off = jax.nn.relu(o).astype(jnp.float32)
    dout = jnp.sum(jnp.maximum(delta - off, 0.0), axis=-1)
    din = jnp.sum(jnp.minimum(delta, off), axis=-1)
    d = c.shape[-1]
    return -(dout + cfg.box_alpha * din) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))


def box_score_rows(cfg: GQEConfig, box, rows: jax.Array) -> jax.Array:
    """Scores of a box batch ``([B,d],[B,d])`` against shared candidate
    rows ``[K, d]`` → ``[B, K]`` (the batch-shared sweep's box analog)."""
    c, o = box
    return box_score(cfg, c[:, None, :], o[:, None, :], rows[None, :, :])


def box_score_all(params, cfg: GQEConfig, box, chunk: int = 8192
                  ) -> jax.Array:
    """``[B, n_entities]`` box affinities, scanned over entity-table
    chunks (box distance has no matmul form — a full [B, N, d]
    intermediate would not fit at production N)."""
    c, o = box
    ent = params["emb"]["ent"]
    n = ent.shape[0]
    pad = (-n) % chunk
    ent_p = jnp.pad(ent, ((0, pad), (0, 0)))
    tiles = ent_p.reshape(-1, chunk, ent.shape[1])

    def body(carry, tile):
        return carry, box_score(cfg, c[:, None, :], o[:, None, :],
                                tile[None, :, :])

    _, out = jax.lax.scan(body, 0, tiles)  # [T, B, chunk]
    out = jnp.moveaxis(out, 0, 1).reshape(c.shape[0], -1)
    return out[:, :n]


def _anchor_embed(
    params: Dict[str, Any],
    cfg: GQEConfig,
    ids: jax.Array,
    neighbor_table: Optional[Dict[str, jax.Array]],
) -> jax.Array:
    """Anchor representation: direct lookup, or the GraphSAGE-style
    neighborhood encoder (models/aggregators.py) when configured.
    Candidate scoring stays direct-embedding either way (the encoder
    enriches the QUERY side; ranking all entities through it would make
    full-ranking sweeps quadratic in the fanout for no protocol reason).
    """
    ent = params["emb"]["ent"]
    if cfg.encoder == "neighborhood":
        if neighbor_table is None:
            raise ValueError(
                "GQEConfig.encoder='neighborhood' needs neighbor_table= "
                "(build_neighbor_table(kg)) threaded into the loss/encode "
                "call")
        from mpqe_tpu.models import aggregators as agg_mod

        return agg_mod.encode_entities(
            params["nbr"], ent, neighbor_table["idx"],
            neighbor_table["mask"], ids, cfg.aggregator)
    return ent[ids]


def branch_vectors(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,  # [B, n]
    edge_rel: jax.Array,  # [n_edges] or [B, n_edges] (per-query)
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
) -> List[jax.Array]:
    """Per-incoming-edge composed vectors at the target node (the query's
    conjunct branches), each ``[B, d]``."""
    spec = STRUCTURES[structure]
    is_box = cfg.decoder == "box"
    is_bibox = cfg.decoder == "bibox"
    compose = (_compose_bibox if is_bibox
               else _compose_box if is_box else _compose)
    intersect = (_intersect_bibox if is_bibox
                 else _intersect_box if is_box else _intersect)

    def anchor(ids):
        e = _anchor_embed(params, cfg, ids, neighbor_table)
        if is_bibox:
            return (e, (e, jnp.zeros_like(e)))
        return (e, jnp.zeros_like(e)) if is_box else e

    # per-node list of composed branch representations (vectors, or
    # (center, offset) box pairs for decoder="box")
    node_branches: List[Optional[List[Any]]] = [None] * spec.n_nodes
    for s in spec.anchor_slots:
        node_branches[s] = [anchor(node_entity[:, s])]
    for node in range(spec.n_nodes):
        in_edges = [j for j in range(spec.n_edges) if spec.edge_dst[j] == node]
        if not in_edges:
            continue
        contribs = []
        for j in in_edges:
            src_vecs = node_branches[spec.edge_src[j]]
            assert src_vecs is not None
            src_vec = (
                src_vecs[0]
                if len(src_vecs) == 1
                else intersect(cfg, params, src_vecs)
            )
            contribs.append(compose(cfg, params, src_vec, edge_rel[..., j]))
        node_branches[node] = contribs
    out = node_branches[spec.target_slot]
    assert out is not None
    return out


def encode_dense(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,  # unused (kept for API parity with MPQE)
    edge_rel: jax.Array,
    edge_norm: jax.Array,  # unused
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Query representation: intersected target vector ``[B, d]``
    (QueryEncoderDecoder semantics), or a ``(center, offset)`` box pair
    for ``decoder='box'``."""
    branches = branch_vectors(
        params, cfg, structure, node_entity, edge_rel, neighbor_table)
    if cfg.decoder == "box":
        return _intersect_box(cfg, params, branches)
    if cfg.decoder == "bibox":
        return _intersect_bibox(cfg, params, branches)
    return _intersect(cfg, params, branches)


def encode_dense_multi(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,  # unused (API parity with MPQE)
    edge_rel_q: jax.Array,  # [B, n_edges] per-query relations
    edge_norm_q: jax.Array,  # unused
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Mixed-formula batched encoding (API parity with
    ``mpqe.encode_dense_multi``): relation hops gather per-query
    parameters, so queries of MANY formulas of one structure encode in a
    single device call."""
    return encode_dense(
        params, cfg, structure, node_entity, node_mode, edge_rel_q, None,
        neighbor_table)


def score_pos_neg(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,  # [B, n]
    edge_rel: jax.Array,  # [n_edges] or [B, n_edges]
    target: jax.Array,  # [B]
    negatives: jax.Array,  # [B, K]
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
):
    """(pos_scores [B], neg_scores [B, K]) with branches computed once;
    honors SoftAnd conjunct-min semantics (unlike scoring a single
    intersected vector would)."""
    ent = params["emb"]["ent"]
    m_cfg = _score_cfg(cfg)
    branches = branch_vectors(
        params, cfg, structure, node_entity, edge_rel, neighbor_table)
    if cfg.decoder == "bibox":
        if cfg.soft_and:
            def min_bibox(cand):
                scores = [bibox_score(cfg, b, cand) for b in branches]
                return jnp.min(jnp.stack(scores, 0), axis=0)

            return min_bibox(ent[target]), min_bibox(ent[negatives])
        rep = _intersect_bibox(cfg, params, branches)
        return (bibox_score(cfg, rep, ent[target]),
                bibox_score(cfg, rep, ent[negatives]))
    if cfg.decoder == "box":
        if cfg.soft_and:
            def min_box(cand, expand):
                scores = [box_score(
                    cfg, b[0][:, None, :] if expand else b[0],
                    b[1][:, None, :] if expand else b[1], cand)
                    for b in branches]
                return jnp.min(jnp.stack(scores, 0), axis=0)

            return (min_box(ent[target], False),
                    min_box(ent[negatives], True))
        c, o = _intersect_box(cfg, params, branches)
        return (box_score(cfg, c, o, ent[target]),
                box_score(cfg, c[:, None, :], o[:, None, :],
                          ent[negatives]))
    if cfg.soft_and:
        def min_score(cand, expand):
            scores = [
                mpqe_mod.score(m_cfg, b[:, None, :] if expand else b, cand)
                for b in branches
            ]
            return jnp.min(jnp.stack(scores, 0), axis=0)

        return min_score(ent[target], False), min_score(ent[negatives], True)
    q = _intersect(cfg, params, branches)
    pos = mpqe_mod.score(m_cfg, q, ent[target])
    neg = mpqe_mod.score(m_cfg, q[:, None, :], ent[negatives])
    return pos, neg


def score_queries(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,
    edge_rel: jax.Array,
    targets: jax.Array,  # [B] or [B, K]
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Affinity scores; SoftAnd scores each conjunct and takes the min."""
    ent = params["emb"]["ent"]
    cand = ent[targets]
    m_cfg = _score_cfg(cfg)
    if cfg.decoder == "bibox":
        branches = branch_vectors(
            params, cfg, structure, node_entity, edge_rel, neighbor_table)
        if cfg.soft_and:
            return jnp.min(jnp.stack(
                [bibox_score(cfg, b, cand) for b in branches], 0), axis=0)
        return bibox_score(
            cfg, _intersect_bibox(cfg, params, branches), cand)
    if cfg.decoder == "box":
        branches = branch_vectors(
            params, cfg, structure, node_entity, edge_rel, neighbor_table)

        def bscore(b):
            c, o = b
            if targets.ndim > 1:
                c, o = c[:, None, :], o[:, None, :]
            return box_score(cfg, c, o, cand)

        if cfg.soft_and:
            return jnp.min(jnp.stack([bscore(b) for b in branches], 0),
                           axis=0)
        return bscore(_intersect_box(cfg, params, branches))
    if cfg.soft_and:
        branches = branch_vectors(
            params, cfg, structure, node_entity, edge_rel, neighbor_table)
        scores = []
        for b in branches:
            q = b if targets.ndim == 1 else b[:, None, :]
            scores.append(mpqe_mod.score(m_cfg, q, cand))
        return jnp.min(jnp.stack(scores, 0), axis=0)
    q = encode_dense(
        params, cfg, structure, node_entity, None, edge_rel, None,
        neighbor_table)
    if targets.ndim > 1:
        q = q[:, None, :]
    return mpqe_mod.score(m_cfg, q, cand)


def _score_cfg(cfg: GQEConfig) -> mpqe_mod.MPQEConfig:
    return mpqe_mod.MPQEConfig(
        n_entities=cfg.n_entities, n_modes=cfg.n_modes, n_rels=cfg.n_rels,
        embed_dim=cfg.embed_dim, margin=cfg.margin,
        scale_scores=cfg.scale_scores,
    )


def dense_batch_loss(
    params: Dict[str, Any],
    cfg: GQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    neighbor_table: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Margin ranking loss (same protocol as MPQE; SURVEY.md §A.4).

    Branch vectors are computed ONCE and scored against positives and
    negatives (two score_queries calls would encode the query twice).

    ``neighbor_table`` (encoder="neighborhood") is partial-bound by the
    driver — inside jit it becomes a compile-time constant, which is fine
    at the CPU quality-bench scale this baseline targets (~50 KB at 588
    entities) but would overflow the remote-relay compile request at
    million-entity scale (CLAUDE.md closure-capture gotcha); the MPQE
    production path never uses it."""
    pos, neg = score_pos_neg(
        params, cfg, structure, node_entity, edge_rel, target, negatives,
        neighbor_table)
    viol = jax.nn.relu(cfg.margin - pos[:, None] + neg)
    w = neg_mask * query_mask[:, None]
    return jnp.sum(viol * w) / jnp.maximum(jnp.sum(w), 1.0)
