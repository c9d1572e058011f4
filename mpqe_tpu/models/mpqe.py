"""The MPQE model: R-GCN over batched query DAGs + readout + cosine scoring.

Reference: mpqe/model.py ``RGCNEncoderDecoder`` (SURVEY.md §2.1, §3.2/§3.3)
— entity + per-mode variable embeddings, ``num_layers`` basis-decomposed
R-GCN layers with ReLU between layers, a readout (TGT/sum/max/concat/mlp),
cosine scores against candidate entity embeddings, margin-ranking loss
against pre-sampled negatives.

TPU-first: parameters are a plain pytree (shardable with NamedSharding),
the forward is a pure function compiled once per (structure, batch-bucket),
and the TGT readout's depth coupling (steps = diameter(structure)) is a
*static* property of the bucket, not dynamic control flow.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mpqe_tpu.queries import STRUCTURES
from mpqe_tpu.ops import embed as embed_ops
from mpqe_tpu.ops import pallas_fused_fwd as fused_fwd_ops
from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.models import embeddings as emb_mod
from mpqe_tpu.models import readout as readout_mod


@dataclasses.dataclass(frozen=True)
class MPQEConfig:
    n_entities: int
    n_modes: int
    n_rels: int  # directed relation vocab (forward + inverse)
    embed_dim: int = 128
    n_layers: int = 3
    num_bases: Optional[int] = None
    readout: str = "tgt"
    margin: float = 1.0
    scale_scores: bool = True  # cosine (normalized) vs raw dot scores
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.readout not in readout_mod.READOUTS:
            raise ValueError(f"bad readout {self.readout}")


def init_mpqe(key: jax.Array, cfg: MPQEConfig) -> Dict[str, Any]:
    k_emb, k_read, *k_layers = jax.random.split(key, 2 + cfg.n_layers)
    params: Dict[str, Any] = {
        "emb": emb_mod.init_embeddings(
            k_emb, cfg.n_entities, cfg.n_modes, cfg.embed_dim, cfg.dtype
        ),
        "layers": [
            rgcn_ops.init_rgcn_layer(
                k, cfg.embed_dim, cfg.embed_dim, cfg.n_rels, cfg.num_bases, cfg.dtype
            )
            for k in k_layers
        ],
        "readout": readout_mod.init_readout(
            k_read, cfg.readout, cfg.embed_dim, cfg.dtype
        ),
    }
    return params


def num_steps(cfg: MPQEConfig, structure: str) -> int:
    """Message-passing depth for a bucket: TGT runs ``diameter`` steps
    (reference "TM" readout; SURVEY.md §3.2), others run all layers."""
    if cfg.readout == "tgt":
        return min(STRUCTURES[structure].diameter, cfg.n_layers)
    return cfg.n_layers


def executed_edge_messages(cfg: "MPQEConfig", structure: str) -> int:
    """Edge messages the forward actually computes per query.

    The TGT readout's dead-slot-pruned path skips messages into slots that
    can no longer reach the target, so the executed count is below the
    logical ``steps * n_edges`` — benchmark throughput claims must count
    what runs on the hardware, not the unpruned-equivalent.
    """
    spec = STRUCTURES[structure]
    steps = num_steps(cfg, structure)
    if cfg.readout == "tgt":
        return sum(len(edges) for _, _, edges in _live_slot_plan(spec, steps))
    return steps * spec.n_edges


# ----------------------------------------------------------------------
# Dense (structure-batched) forward — the hot path
# ----------------------------------------------------------------------
def _live_slot_plan(spec, steps: int):
    """Per-layer (in_slots, out_slots, edge_ids) keeping only slots that
    can still influence the target within the remaining steps.  The TGT
    readout reads one slot, so later layers need progressively fewer
    slots — e.g. 3-chain_inter runs 7 slot-matmuls instead of 14.  Purely
    static (computed from the template at trace time)."""
    needed = {spec.target_slot}
    plan = []
    for _ in range(steps):
        out_slots = tuple(sorted(needed))
        edges = tuple(
            j for j in range(spec.n_edges) if spec.edge_dst[j] in needed
        )
        in_needed = set(needed)
        for j in edges:
            in_needed.add(spec.edge_src[j])
        plan.append((tuple(sorted(in_needed)), out_slots, edges))
        needed = in_needed
    plan.reverse()
    return plan


def anchor_gather_slots(cfg: "MPQEConfig", structure: str):
    """Anchor slots whose entity rows the forward actually reads (the
    TGT-pruned path drops anchors that cannot reach the target within the
    available steps).  Order matches the ``anchor_rows`` layout expected
    by :func:`encode_dense`."""
    spec = STRUCTURES[structure]
    anchors = set(spec.anchor_slots)
    if cfg.readout == "tgt":
        steps = num_steps(cfg, structure)
        in_slots0 = _live_slot_plan(spec, steps)[0][0]
        return tuple(s for s in in_slots0 if s in anchors)
    return tuple(s for s in range(spec.n_nodes) if s in anchors)


def _encode_dense_tgt_pruned(
    params, cfg, spec, node_entity, node_mode, edge_rel, edge_norm, steps,
    anchor_rows=None,
):
    plan = _live_slot_plan(spec, steps)
    in_slots0 = plan[0][0]
    anchors = set(spec.anchor_slots)
    a_col = {s: k for k, s in enumerate(
        s for s in in_slots0 if s in anchors)}
    # slot -> [B, d]: the slots are never consumed as one [B, n, d]
    # tensor on this path (tgt readout reads a single slot), so keep
    # them as separate arrays — the round-2 trace attribution showed
    # the stack/slice round-trips cost real layout copies on TPU.
    # Variable slots stay FACTORED as [B] mode indices into the tiny
    # [n_modes, d] table through layer 0: matmul-then-gather is exactly
    # gather-then-matmul, so their self/message transforms run as
    # [n_modes, d] @ [d, d] GEMMs followed by a row gather — the round-3
    # trace showed the eager [B, d] var materializations alone were ~59%
    # of the flagship forward's device time.
    xs = {}
    var_oh = {}  # layer-0 variable slots: slot -> [B, n_modes] one-hot
    n_modes = params["emb"]["var"].shape[0]
    for s in in_slots0:
        if s in anchors:
            if anchor_rows is not None:
                xs[s] = anchor_rows[:, a_col[s], :]
            else:
                xs[s] = params["emb"]["ent"][node_entity[:, s]]
        else:
            # the [B, n_modes] @ [n_modes, d] one-hot MXU matmul below
            # streams at full HBM bandwidth where a row-gather of the
            # same rows is transaction-bound (the round-3 trace measured
            # the var gathers at ~55% of the flagship forward's device
            # time); precision=HIGHEST keeps the selection exact (1.0
            # and 0.0 are exact in every pass of the f32 emulation)
            var_oh[s] = (node_mode[:, s, None] ==
                         jnp.arange(n_modes)[None, :]).astype(jnp.float32)
    var_table = params["emb"]["var"]  # [n_modes, d]
    cur_slots = in_slots0

    for li, (in_slots, out_slots, edges) in enumerate(plan):
        assert in_slots == cur_slots
        lp = params["layers"][li]
        w_e = rgcn_ops._edge_weights(lp, edge_rel) if edges else None
        last = li == steps - 1

        def term(s, w):
            if s in xs:
                return jnp.dot(xs[s], w, preferred_element_type=jnp.float32)
            # matmul-then-combine == gather-then-matmul, exactly
            mini = jnp.dot(var_table, w, preferred_element_type=jnp.float32)
            return jax.lax.dot(var_oh[s], mini,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

        nxt = {}
        for s in out_slots:
            acc = term(s, lp["w_self"])
            for j in edges:
                if spec.edge_dst[j] != s:
                    continue
                msg = term(spec.edge_src[j], w_e[j])
                acc = acc + msg * edge_norm[j].astype(msg.dtype)
            acc = (acc + lp["bias"]).astype(cfg.dtype)
            nxt[s] = acc if last else jax.nn.relu(acc)
        xs = nxt
        var_oh = {}  # factored form exists only at layer 0
        cur_slots = out_slots
    return xs[spec.target_slot]


def encode_dense(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel: jax.Array,  # [n_edges] int32
    edge_norm: jax.Array,  # [n_edges] float32
    anchor_rows: Optional[jax.Array] = None,  # [B, A, d] pre-gathered
) -> jax.Array:
    """Embed + message-pass + read out: returns query vectors ``[B, d]``.

    ``anchor_rows`` (columns per :func:`anchor_gather_slots`) lets the
    caller supply pre-gathered entity rows so the whole batch shares one
    table gather — see ``dense_batch_loss``.
    """
    spec = STRUCTURES[structure]
    steps = num_steps(cfg, structure)
    if cfg.readout == "tgt":
        # dead-slot-pruned path: compute only slots that can still reach
        # the target (identical math, fewer matmuls + less HBM traffic)
        return _encode_dense_tgt_pruned(
            params, cfg, spec, node_entity, node_mode, edge_rel,
            edge_norm, steps, anchor_rows=anchor_rows,
        )
    x = emb_mod.embed_nodes_template(
        params["emb"], node_entity, node_mode,
        spec.anchor_slots, spec.n_nodes, anchor_rows=anchor_rows,
    )

    for li in range(steps):
        x = rgcn_ops.rgcn_dense_template(
            x,
            params["layers"][li],
            spec.edge_src,
            spec.edge_dst,
            edge_rel,
            edge_norm,
        ).astype(cfg.dtype)  # fp32 MXU accumulation, cfg-dtype activations
        if li < steps - 1:
            x = jax.nn.relu(x)
    return readout_mod.readout_dense(
        cfg.readout, params["readout"], x, spec.target_slot
    )


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 8, 9, 10, 11, 12, 13, 14, 15))
def encode_dense_fused(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel: jax.Array,  # [n_edges] int32
    edge_norm: jax.Array,  # [n_edges] float32
    anchor_rows: Optional[jax.Array] = None,
    block: int = 2048,
    interpret: bool = False,
    onehot_operand: bool = False,
    split_gemm: bool = False,
    vmem_limit_mb: Optional[int] = None,
    backward: str = "xla",
    bwd_block: int = 1024,
    out_bf16: bool = False,
) -> jax.Array:
    """:func:`encode_dense` with the forward pass run as ONE Pallas
    kernel (ops/pallas_fused_fwd): the whole multi-layer pruned TGT plan
    executes per B-block in VMEM, so only the compulsory inputs/outputs
    touch HBM.

    ``backward`` selects the gradient path:

    * ``"xla"`` (default) — recompute through :func:`encode_dense`;
      gradients bit-identical to differentiating the XLA path.
    * ``"pallas"`` — :func:`ops.pallas_fused_fwd.fused_tgt_backward`:
      the same VMEM-block structure run in reverse (dW accumulated in
      VMEM, activations recomputed in-kernel, anchor-row cotangents fed
      to the ordinary scatter).  Gradients match to bf16-matmul
      tolerance (same numerics class as XLA's default precision).

    ``onehot_operand`` / ``split_gemm`` / ``vmem_limit_mb`` pass through
    to :func:`ops.pallas_fused_fwd.fused_tgt_forward` so product callers
    (bench, train) can select kernel variants or raise the scoped-VMEM
    limit without bypassing this custom-VJP wrapper.

    Requires ``readout='tgt'`` and f32 activations (``cfg.dtype``).
    """
    return fused_fwd_ops.fused_tgt_forward(
        params, cfg, structure, node_entity, node_mode, edge_rel,
        edge_norm, anchor_rows, block=block, interpret=interpret,
        onehot_operand=onehot_operand, split_gemm=split_gemm,
        vmem_limit_mb=vmem_limit_mb, out_bf16=out_bf16,
    )


def _encode_dense_fused_fwd(params, cfg, structure, node_entity, node_mode,
                            edge_rel, edge_norm, anchor_rows, block,
                            interpret, onehot_operand, split_gemm,
                            vmem_limit_mb, backward, bwd_block, out_bf16):
    out = fused_fwd_ops.fused_tgt_forward(
        params, cfg, structure, node_entity, node_mode, edge_rel,
        edge_norm, anchor_rows, block=block, interpret=interpret,
        onehot_operand=onehot_operand, split_gemm=split_gemm,
        vmem_limit_mb=vmem_limit_mb, out_bf16=out_bf16,
    )
    return out, (params, node_entity, node_mode, edge_rel, edge_norm,
                 anchor_rows)


def _encode_dense_fused_bwd(cfg, structure, block, interpret, onehot_operand,
                            split_gemm, vmem_limit_mb, backward, bwd_block,
                            out_bf16, res, g):
    params, node_entity, node_mode, edge_rel, edge_norm, anchor_rows = res
    if g.dtype != jnp.float32:  # out_bf16 forward: upcast the cotangent
        g = g.astype(jnp.float32)
    if backward == "pallas":
        dp, den, dar = fused_fwd_ops.fused_tgt_backward(
            params, cfg, structure, node_entity, node_mode, edge_rel,
            edge_norm, anchor_rows, g, block=bwd_block,
            interpret=interpret, vmem_limit_mb=vmem_limit_mb)
        return dp, None, None, None, den, dar
    if backward != "xla":
        raise ValueError(f"unknown backward mode {backward!r}")
    if anchor_rows is None:
        _, vjp = jax.vjp(
            lambda p, en: encode_dense(
                p, cfg, structure, node_entity, node_mode, edge_rel, en),
            params, edge_norm,
        )
        dp, den = vjp(g)
        return dp, None, None, None, den, None
    # anchor_rows may be the stacked [B, A, d] array or a tuple of
    # per-slot [B, d] arrays (the kernel's zero-copy form); encode_dense
    # takes the stacked form, so adapt both ways
    is_seq = isinstance(anchor_rows, (tuple, list))
    ar_in = jnp.stack(anchor_rows, axis=1) if is_seq else anchor_rows
    _, vjp = jax.vjp(
        lambda p, en, ar: encode_dense(
            p, cfg, structure, node_entity, node_mode, edge_rel, en,
            anchor_rows=ar),
        params, edge_norm, ar_in,
    )
    dp, den, dar = vjp(g)
    if is_seq:
        dar = type(anchor_rows)(
            dar[:, k, :] for k in range(dar.shape[1]))
    return dp, None, None, None, den, dar


encode_dense_fused.defvjp(_encode_dense_fused_fwd, _encode_dense_fused_bwd)


def _perq_edge_coeff(params, edge_rel_q: jax.Array, j: int):
    """Per-query basis coefficients for template edge slot j: [B, Bb]."""
    return params["coeff"][edge_rel_q[:, j]]


def encode_dense_multi(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel_q: jax.Array,  # [B, n_edges] int32 — PER-QUERY relations
    edge_norm_q: jax.Array,  # [B, n_edges] float32
) -> jax.Array:
    """Dense template forward with per-query relations: one device call
    encodes queries of MANY formulas of the same structure at once.

    The eval sweep's host bottleneck was one padded dispatch per formula
    (reference protocol iterates formulas; SURVEY.md §3.4).  Here the
    per-edge weight is contracted basis-first per query —
    ``h_b = x_src @ V_b`` for each basis then ``sum_b coeff[rel_e, b]
    h_b`` — costing ``num_bases``x the shared-relation FLOPs but
    collapsing hundreds of dispatches into one.  Full-weight layers
    instead gather the per-query matrices ``w_rel[rel_e] -> [B, d, do]``
    and apply a batched matvec: HBM-heavier per edge slot (chunk the
    batch via the caller's ``max_batch``) but still one dispatch where
    the reference protocol issues one per formula.
    """
    spec = STRUCTURES[structure]
    steps = num_steps(cfg, structure)
    if cfg.readout == "tgt":
        plan = _live_slot_plan(spec, steps)
    else:
        all_slots = tuple(range(spec.n_nodes))
        plan = [(all_slots, all_slots, tuple(range(spec.n_edges)))] * steps

    in_slots0 = plan[0][0]
    anchors = set(spec.anchor_slots)
    # slot -> [B, d] (no [B, n, d] stack/slice round-trips; see
    # _encode_dense_tgt_pruned) — non-tgt readouts stack ONCE at the end
    xs = {}
    var_table = params["emb"]["var"]
    n_modes = var_table.shape[0]
    for s in in_slots0:
        if s in anchors:
            xs[s] = params["emb"]["ent"][node_entity[:, s]]
        else:
            # one-hot MXU row selection instead of a transaction-bound
            # row gather (see _encode_dense_tgt_pruned); HIGHEST keeps
            # it exact
            oh = (node_mode[:, s, None] ==
                  jnp.arange(n_modes)[None, :]).astype(jnp.float32)
            xs[s] = jax.lax.dot(oh, var_table.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                                ).astype(var_table.dtype)
    cur_slots = in_slots0

    for li, (in_slots, out_slots, edges) in enumerate(plan):
        lp = params["layers"][li]
        has_basis = "basis" in lp
        if has_basis:
            basis = lp["basis"]  # [Bb, d, do]
            # hoist the per-basis transform per needed source slot
            src_slots = sorted({spec.edge_src[j] for j in edges})
            h_b = {
                s: jnp.einsum(
                    "bd,kdo->bko", xs[s], basis,
                    preferred_element_type=jnp.float32,
                )
                for s in src_slots
            }
        last = li == steps - 1
        nxt = {}
        for s in out_slots:
            acc = jnp.dot(
                xs[s], lp["w_self"],
                preferred_element_type=jnp.float32,
            )
            for j in edges:
                if spec.edge_dst[j] != s:
                    continue
                if has_basis:
                    ce = _perq_edge_coeff(lp, edge_rel_q, j)  # [B, Bb]
                    msg = jnp.einsum(
                        "bk,bko->bo", ce, h_b[spec.edge_src[j]],
                        preferred_element_type=jnp.float32,
                    )
                else:
                    w_q = lp["w_rel"][edge_rel_q[:, j]]  # [B, d, do]
                    msg = jnp.einsum(
                        "bd,bdo->bo", xs[spec.edge_src[j]], w_q,
                        preferred_element_type=jnp.float32,
                    )
                acc = acc + msg * edge_norm_q[:, j, None].astype(msg.dtype)
            acc = (acc + lp["bias"]).astype(cfg.dtype)
            nxt[s] = acc if last else jax.nn.relu(acc)
        xs = nxt
        cur_slots = out_slots
    if cfg.readout == "tgt":
        return xs[spec.target_slot]
    x = jnp.stack([xs[s] for s in cur_slots], axis=1)
    return readout_mod.readout_dense(
        cfg.readout, params["readout"], x, spec.target_slot
    )


def multi_kernel_eligible(cfg: MPQEConfig, structure: str) -> bool:
    """True when the per-query-relation Pallas kernel
    (:func:`ops.pallas_fused_fwd.fused_tgt_forward_multi`) can encode
    this (model, structure) on the current backend: TGT readout, basis
    decomposition, packed variable one-hot, and a compiled (non-CPU)
    backend.  ``MPQE_NO_MULTI_KERNEL=1`` is the escape hatch back to the
    XLA path."""
    import os

    if os.environ.get("MPQE_NO_MULTI_KERNEL"):
        return False
    if cfg.readout != "tgt" or cfg.num_bases is None:
        return False
    if jax.default_backend() == "cpu":
        return False
    spec = STRUCTURES[structure]
    plan = _live_slot_plan(spec, num_steps(cfg, structure))
    anchors = set(spec.anchor_slots)
    n_var = sum(1 for s in plan[0][0] if s not in anchors)
    d_pad = -(-cfg.embed_dim // 128) * 128
    m8 = -(-max(cfg.n_modes, 1) // 8) * 8
    return cfg.n_modes <= d_pad and n_var * m8 <= d_pad


def encode_dense_multi_auto(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,  # static
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel_q: jax.Array,
    edge_norm_q: jax.Array,
) -> jax.Array:
    """Per-query-relation encode, routed through the fused Pallas multi
    kernel when the model qualifies (see :func:`multi_kernel_eligible`),
    else :func:`encode_dense_multi`.  The production eval/serve surfaces
    call this so the kernel's VMEM-resident forward carries the encode-
    bound paths on TPU (VERDICT r3 item 4); backend dispatch happens at
    trace time (one compiled program per (structure, bucket) either way).
    """
    if multi_kernel_eligible(cfg, structure):
        import os

        # the kernel's wide [bb, Bb*d_pad] f32 message operands need
        # ~55 MB scoped VMEM at block=1024 — over Mosaic's 16 MB default,
        # so the limit MUST be raised or the TPU compile fails (measured
        # round 5; with it, 4.62 ms vs 5.40 ms XLA at B=131072).
        # block=2048 OOMs even at 100 MB.
        vl = int(os.environ.get("MPQE_MULTI_VMEM_MB", "100"))
        return fused_fwd_ops.fused_tgt_forward_multi(
            params, cfg, structure, node_entity, node_mode, edge_rel_q,
            edge_norm_q, block=1024, vmem_limit_mb=vl)
    return encode_dense_multi(
        params, cfg, structure, node_entity, node_mode, edge_rel_q,
        edge_norm_q)


def dense_batch_loss_shared_negs(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,  # [B]
    shared_negatives: jax.Array,  # [K] — ONE negative set for the batch
    query_mask: jax.Array,  # [B]
    encoder: str = "dense",
    fused_block: int = 2048,
    fused_backward: str = "xla",
    fused_bwd_block: int = 1024,
    fused_vmem_limit_mb: Optional[int] = None,
    interpret: bool = False,
    self_adv_tau: float = 0.0,
) -> jax.Array:
    """Margin loss with batch-shared negatives (protocol VARIANT).

    The reference protocol stores per-query negatives; this variant
    scores every query against one shared set of K candidates, so the
    entity-table traffic drops from (anchors + 1 + K) to (anchors + 1)
    rows per query plus K rows per batch — on TPU the random-row
    transactions are the train-step bottleneck (BASELINE.md round 2), so
    this is the ~35 ms step configuration.  Negative scoring becomes one
    [B, d] @ [d, K] MXU matmul.  Off by default; enable knowingly.

    ``encoder="fused_fwd"`` routes the encode through the fused
    whole-forward Pallas kernel (with ``fused_backward`` selecting its
    gradient path) so the two train-step levers compose.

    ``self_adv_tau > 0`` switches the candidate reduction from a
    uniform mean to self-adversarial weighting (RotatE convention,
    arXiv:1902.10197 §3.1): each query's violations are weighted by
    ``softmax(tau * score)`` over its live candidates, with the weights
    stop-gradiented — the margin push concentrates on the candidates
    the model currently ranks highest (at convergence, the hard
    negatives), at zero extra FLOPs beyond the softmax over the
    already-computed [B, K] score matrix.
    """
    a_slots = list(anchor_gather_slots(cfg, structure))
    n_a = len(a_slots)
    idx = jnp.concatenate([node_entity[:, a_slots], target[:, None]], axis=1)
    rows = embed_ops.embedding_lookup(params["emb"]["ent"], idx)
    anchor_rows = rows[:, :n_a, :]
    pos_rows = rows[:, n_a, :]
    neg_rows = embed_ops.embedding_lookup(
        params["emb"]["ent"], shared_negatives)  # [K, d]
    if encoder == "fused_fwd":
        q = encode_dense_fused(
            params, cfg, structure, node_entity, node_mode, edge_rel,
            edge_norm, anchor_rows, fused_block, interpret, False, False,
            fused_vmem_limit_mb, fused_backward, fused_bwd_block)
    elif encoder == "dense":
        q = encode_dense(
            params, cfg, structure, node_entity, node_mode, edge_rel,
            edge_norm, anchor_rows=anchor_rows,
        )
    else:
        raise ValueError(f"unknown encoder {encoder!r}")
    qf = q.astype(jnp.float32)
    nf = neg_rows.astype(jnp.float32)
    if cfg.scale_scores:
        qf = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True) + 1e-12)
        nf = nf / (jnp.linalg.norm(nf, axis=-1, keepdims=True) + 1e-12)
    pos = score(cfg, q, pos_rows)  # [B]
    neg = jnp.dot(qf, nf.T, preferred_element_type=jnp.float32)  # [B, K]
    viol = jax.nn.relu(cfg.margin - pos[:, None] + neg)
    # a shared candidate that IS some query's positive target would be
    # actively pushed down by that query every step (in-batch false
    # negative) — mask those (query, candidate) pairs out of the loss
    not_self = (shared_negatives[None, :] != target[:, None])
    w = query_mask[:, None] * not_self.astype(viol.dtype)
    if self_adv_tau > 0.0:
        # per-query softmax over live candidates ((query, cand) pairs
        # with w == 0 sit at -inf); rows with no live candidate (padded
        # queries) would softmax to NaN — zero them via the outer
        # query_mask weighting instead of feeding them forward
        logits = jnp.where(w > 0, self_adv_tau * neg, -jnp.inf)
        has_live = jnp.sum(w, axis=1) > 0
        p_adv = jax.lax.stop_gradient(
            jax.nn.softmax(jnp.where(has_live[:, None], logits, 0.0),
                           axis=1))
        per_q = jnp.sum(jnp.where(w > 0, p_adv * viol, 0.0), axis=1)
        live_q = has_live.astype(viol.dtype) * query_mask
        return (jnp.sum(per_q * live_q)
                / jnp.maximum(jnp.sum(live_q), 1.0))
    return jnp.sum(viol * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_shared_negs_batch_loss(n_shared: int, encoder: str = "dense",
                                fused_block: int = 2048,
                                fused_backward: str = "xla",
                                fused_bwd_block: int = 1024,
                                fused_vmem_limit_mb: Optional[int] = None,
                                interpret: bool = False,
                                self_adv_tau: float = 0.0):
    """Adapt ``dense_batch_loss_shared_negs`` to the train loop's
    standard ``batch_loss_fn`` signature (``train/loop.py
    make_train_step``), so ``train.py --shared_negatives K`` can select
    the batch-shared-candidates protocol variant end-to-end.
    ``encoder="fused_fwd"`` composes it with the fused whole-forward
    kernel (``--kernel fused_fwd --shared_negatives K``).

    The shared candidate set is drawn IN-GRAPH from the batch's own
    per-query sampled negatives (one candidate per donor query, donors
    strided across the batch for formula diversity) — no new data path
    or host RNG.  Donor rows that are padding (query_mask == 0) fall
    back to the first query's negative, which is live in any non-empty
    batch.  Candidates keep the sampler's same-mode convention w.r.t.
    their DONOR query, so a mixed-mode batch yields a mixed-mode
    candidate set; cross-mode candidates are easy negatives, which is
    the protocol trade-off this variant knowingly makes for the ~1.6x
    step-time win (BASELINE.md shared-negatives rows).
    """
    if n_shared <= 0:
        raise ValueError("n_shared must be positive")

    def fn(params, cfg, structure, node_entity, node_mode, edge_rel,
           edge_norm, target, negatives, neg_mask, query_mask):
        bsz = negatives.shape[0]
        k = min(n_shared, bsz)
        donors = (jnp.arange(k) * max(bsz // k, 1)) % bsz
        cand = negatives[donors, 0]
        live = query_mask[donors] > 0
        shared = jnp.where(live, cand, negatives[0, 0])
        return dense_batch_loss_shared_negs(
            params, cfg, structure, node_entity, node_mode, edge_rel,
            edge_norm, target, shared, query_mask, encoder=encoder,
            fused_block=fused_block, fused_backward=fused_backward,
            fused_bwd_block=fused_bwd_block,
            fused_vmem_limit_mb=fused_vmem_limit_mb, interpret=interpret,
            self_adv_tau=self_adv_tau)

    return fn


# ----------------------------------------------------------------------
# Sparse forward — general graphs / distributed path
# ----------------------------------------------------------------------
def encode_sparse(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,  # static (None-like "" => run all layers)
    node_entity: jax.Array,  # [N]
    node_mode: jax.Array,  # [N]
    node_is_var: jax.Array,  # [N]
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    node_query: jax.Array,  # [N]
    target_node: jax.Array,  # [B]
    n_queries: int,  # static
    segment_backend: str = "xla",
) -> jax.Array:
    x = emb_mod.embed_nodes_sparse(
        params["emb"], node_entity, node_mode, node_is_var
    )
    steps = num_steps(cfg, structure) if structure else cfg.n_layers
    for li in range(steps):
        x = rgcn_ops.rgcn_sparse(
            x,
            params["layers"][li],
            edge_src,
            edge_dst,
            edge_rel,
            edge_norm,
            cfg.n_rels,
            segment_backend=segment_backend,
        )
        if li < steps - 1:
            x = jax.nn.relu(x)
    n_tpl = STRUCTURES[structure].n_nodes if structure else None
    return readout_mod.readout_sparse(
        cfg.readout,
        params["readout"],
        x,
        node_query,
        target_node,
        n_queries,
        n_template_nodes=n_tpl,
        segment_backend=segment_backend,
    )


def encode_sparse_fused(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    node_is_var: jax.Array,
    chunked: Dict[str, Any],  # from ops.pallas_rgcn.chunk_by_relation
    node_query: jax.Array,
    target_node: jax.Array,
    n_queries: int,
    interpret: bool = False,
) -> jax.Array:
    """Sparse forward through the fused Pallas R-GCN kernel (VMEM-resident
    gather->basis-GEMM->scatter; ops/pallas_rgcn.py).  Same math as
    encode_sparse — the edge list arrives relation-chunk-aligned
    (chunk_by_relation) instead of as a flat EdgeStore."""
    from mpqe_tpu.ops import pallas_rgcn

    x = emb_mod.embed_nodes_sparse(
        params["emb"], node_entity, node_mode, node_is_var
    )
    steps = num_steps(cfg, structure) if structure else cfg.n_layers
    for li in range(steps):
        x = pallas_rgcn.rgcn_sparse_fused(
            x, params["layers"][li], chunked, cfg.n_rels,
            interpret=interpret,
        ).astype(cfg.dtype)
        if li < steps - 1:
            x = jax.nn.relu(x)
    n_tpl = STRUCTURES[structure].n_nodes if structure else None
    return readout_mod.readout_sparse(
        cfg.readout, params["readout"], x, node_query, target_node,
        n_queries, n_template_nodes=n_tpl,
    )


def encode_sparse_blocked(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    node_is_var: jax.Array,
    bucketed: Dict[str, Any],  # from ops.pallas_rgcn_blocked.bucket_edges_blocked
    node_query: jax.Array,
    target_node: jax.Array,
    n_queries: int,
    interpret: bool = False,
) -> jax.Array:
    """Sparse forward through the blocked bf16 kernel (zero random-row
    HBM access; ops/pallas_rgcn_blocked.py).  Same math as encode_sparse
    to bf16 tolerance; requires basis-decomposed layers."""
    from mpqe_tpu.ops import pallas_rgcn_blocked as prb

    x = emb_mod.embed_nodes_sparse(
        params["emb"], node_entity, node_mode, node_is_var
    )
    steps = num_steps(cfg, structure) if structure else cfg.n_layers
    for li in range(steps):
        x = prb.rgcn_sparse_blocked(
            x, params["layers"][li], bucketed, cfg.n_rels,
            interpret=interpret,
        ).astype(cfg.dtype)
        if li < steps - 1:
            x = jax.nn.relu(x)
    n_tpl = STRUCTURES[structure].n_nodes if structure else None
    return readout_mod.readout_sparse(
        cfg.readout, params["readout"], x, node_query, target_node,
        n_queries, n_template_nodes=n_tpl,
    )


# ----------------------------------------------------------------------
# Scoring and loss
# ----------------------------------------------------------------------
def score(
    cfg: MPQEConfig, q: jax.Array, cand: jax.Array
) -> jax.Array:
    """Cosine (or dot) affinity between query vectors ``[..., d]`` and
    candidate entity embeddings of matching shape (fp32 internally)."""
    q = q.astype(jnp.float32)
    cand = cand.astype(jnp.float32)
    if cfg.scale_scores:
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        cand = cand / (jnp.linalg.norm(cand, axis=-1, keepdims=True) + 1e-12)
    return jnp.sum(q * cand, axis=-1)


def score_all_entities(
    params: Dict[str, Any], cfg: MPQEConfig, q: jax.Array
) -> jax.Array:
    """``[B, n_entities]`` affinities — one big MXU matmul (eval sweep)."""
    e = params["emb"]["ent"]
    if cfg.scale_scores:
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
    return jnp.dot(q, e.T, preferred_element_type=jnp.float32)


def margin_loss_from_rows(
    cfg: MPQEConfig,
    q: jax.Array,  # [B, d]
    pos_rows: jax.Array,  # [B, d]
    neg_rows: jax.Array,  # [B, K, d]
    neg_mask: jax.Array,  # [B, K]
    query_mask: jax.Array,  # [B]
) -> jax.Array:
    """mean(relu(margin - s(q,pos) + s(q,neg))) over real (query, negative)
    pairs (reference margin_loss; SURVEY.md §3.3/§A.4) from pre-gathered
    candidate embedding rows."""
    pos = score(cfg, q, pos_rows)  # [B]
    neg = score(cfg, q[:, None, :], neg_rows)  # [B, K]
    viol = jax.nn.relu(cfg.margin - pos[:, None] + neg)
    w = neg_mask * query_mask[:, None]
    return jnp.sum(viol * w) / jnp.maximum(jnp.sum(w), 1.0)


def margin_loss_from_queries(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    q: jax.Array,  # [B, d]
    target: jax.Array,  # [B]
    negatives: jax.Array,  # [B, K]
    neg_mask: jax.Array,  # [B, K]
    query_mask: jax.Array,  # [B]
) -> jax.Array:
    ent = params["emb"]["ent"]
    return margin_loss_from_rows(
        cfg, q, ent[target], ent[negatives], neg_mask, query_mask
    )


def dense_batch_loss(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
) -> jax.Array:
    """Batch margin loss: direct per-consumer table gathers.

    Round-2 profiling settled how to access the entity table here: a
    concatenated single-gather formulation (``dense_batch_loss_fused``)
    forces ~6 ms/step of XLA layout copies around the [B, 7, d] gather,
    while the backward scatter costs the same either way (XLA sorts
    scatter indices internally; row transactions, not scatter count,
    bound the time — BASELINE.md round 2).  The straightforward
    formulation is therefore also the fastest.
    """
    q = encode_dense(
        params, cfg, structure, node_entity, node_mode, edge_rel, edge_norm
    )
    return margin_loss_from_queries(
        params, cfg, q, target, negatives, neg_mask, query_mask
    )


def dense_batch_loss_fused(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    grad_scatter: str = "dense",
) -> jax.Array:
    """Single fused entity-table access variant (kept for measurement:
    one gather + one backward scatter, but XLA inserts [B, 7, d] layout
    copies that make it ~2% slower than ``dense_batch_loss`` on v5e).
    Math identical; selectable backward scatter strategy."""
    a_slots = list(anchor_gather_slots(cfg, structure))
    n_a = len(a_slots)
    idx = jnp.concatenate(
        [node_entity[:, a_slots], target[:, None], negatives], axis=1
    )
    rows = embed_ops.embedding_lookup(params["emb"]["ent"], idx, grad_scatter)
    anchor_rows = rows[:, :n_a, :]
    pos_rows = rows[:, n_a, :]
    neg_rows = rows[:, n_a + 1:, :]
    q = encode_dense(
        params, cfg, structure, node_entity, node_mode, edge_rel, edge_norm,
        anchor_rows=anchor_rows,
    )
    return margin_loss_from_rows(
        cfg, q, pos_rows, neg_rows, neg_mask, query_mask
    )


# ----------------------------------------------------------------------
# Kernel-path batch losses (dense signature -> on-device sparse layout)
# ----------------------------------------------------------------------
def _sparse_view_on_device(structure: str, node_entity, node_mode):
    """Flatten a dense template batch into the sparse-view node arrays,
    all synthesized on-device (ops/template_layout.py rationale)."""
    spec = STRUCTURES[structure]
    B, n = node_entity.shape
    is_var = [0.0] * n
    for s in spec.free_slots:
        is_var[s] = 1.0
    node_is_var = jnp.tile(jnp.asarray(is_var, jnp.float32), B)
    node_query = jax.lax.iota(jnp.int32, B * n) // n
    target_node = jax.lax.iota(jnp.int32, B) * n + spec.target_slot
    return (node_entity.reshape(-1), node_mode.reshape(-1), node_is_var,
            node_query, target_node, B)


def dense_batch_loss_kernel_fused(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``dense_batch_loss`` math routed through the fused Pallas R-GCN
    kernel (ops/pallas_rgcn.py): same dense-batch arguments, so it drops
    into ``make_train_step`` as ``batch_loss_fn`` (``--kernel fused``).
    The relation-chunk layout is built on-device per step
    (ops/template_layout.py) — zero host work, one executable per
    (structure, B) bucket."""
    from mpqe_tpu.ops import template_layout

    ne_f, nm_f, niv, nq, tn, B = _sparse_view_on_device(
        structure, node_entity, node_mode)
    chunked = template_layout.template_chunked(
        structure, edge_rel, edge_norm, B, chunk)
    q = encode_sparse_fused(
        params, cfg, structure, ne_f, nm_f, niv, chunked, nq, tn, B,
        interpret=interpret)
    return margin_loss_from_queries(
        params, cfg, q, target, negatives, neg_mask, query_mask)


def dense_batch_loss_kernel_fused_fwd(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    block: int = 2048,
    interpret: bool = False,
    vmem_limit_mb: Optional[int] = None,
    backward: str = "xla",
    bwd_block: int = 1024,
) -> jax.Array:
    """``dense_batch_loss`` with the forward routed through the fused
    whole-forward Pallas kernel (ops/pallas_fused_fwd; ``--kernel
    fused_fwd``).  ``backward="xla"`` recomputes gradients through the
    XLA path (bit-identical to ``dense_batch_loss``); ``backward=
    "pallas"`` runs the fused Pallas backward kernel (tolerance
    parity, fwd+bwd both VMEM-resident).  Requires ``readout='tgt'``."""
    q = encode_dense_fused(
        params, cfg, structure, node_entity, node_mode, edge_rel,
        edge_norm, None, block, interpret, False, False, vmem_limit_mb,
        backward, bwd_block)
    return margin_loss_from_queries(
        params, cfg, q, target, negatives, neg_mask, query_mask)


def dense_batch_loss_kernel_blocked(
    params: Dict[str, Any],
    cfg: MPQEConfig,
    structure: str,
    node_entity: jax.Array,
    node_mode: jax.Array,
    edge_rel: jax.Array,
    edge_norm: jax.Array,
    target: jax.Array,
    negatives: jax.Array,
    neg_mask: jax.Array,
    query_mask: jax.Array,
    queries_per_block: int = 512,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``dense_batch_loss`` math routed through the blocked bf16 kernel
    (ops/pallas_rgcn_blocked.py, Pallas fwd AND bwd) — ``--kernel
    blocked``.  Diagonal query-aligned node blocks (ops/template_layout
    .py) give a zero-padding static layout; requires basis decomposition
    (the kernel's contract)."""
    from mpqe_tpu.ops import template_layout

    if cfg.num_bases is None:
        raise ValueError("--kernel blocked requires num_bases > 0")
    ne_f, nm_f, niv, nq, tn, B = _sparse_view_on_device(
        structure, node_entity, node_mode)
    bucketed = template_layout.template_blocked(
        structure, edge_rel, edge_norm, B,
        queries_per_block=queries_per_block, chunk=chunk)
    q = encode_sparse_blocked(
        params, cfg, structure, ne_f, nm_f, niv, bucketed, nq, tn, B,
        interpret=interpret)
    return margin_loss_from_queries(
        params, cfg, q, target, negatives, neg_mask, query_mask)
