"""Fused whole-forward Pallas kernel for the dense TGT template path.

The XLA pruned forward (models/mpqe.py ``_encode_dense_tgt_pruned``) is
memory-bound at the flagship shape; the remaining gap to the
compulsory-traffic roofline is inter-layer [B, d] activations XLA
materializes plus per-term GEMM issue overhead.  This kernel runs the
ENTIRE multi-layer pruned forward for a block of queries without
leaving VMEM — and it collapses each layer to ONE MXU GEMM:

* every live anchor slot of layer 0 is a ``[bb, d_pad]`` bf16 operand
  (anchor entity rows, cast before the DMA — the MXU reads bf16
  operands anyway and anchor reads are the dominant HBM traffic);
* ALL layer-0 variable slots share ONE ``[bb, d_pad]`` one-hot block,
  built in-kernel from each slot's mode id at disjoint column offsets
  (packing them keeps the layer-0 GEMM's contraction dim — and the
  kernel is compute-bound at the flagship shape, so the padded-block
  FLOPs are the cost that matters — one 128-lane block instead of one
  per slot); if ``n_var * round_up(n_modes, 8) > d_pad`` the layout
  falls back to one block per variable slot;
* the layer's whole slot-to-slot linear map (self transforms, per-edge
  relation transforms with ``edge_norm`` folded in, and the tiny
  variable-mode table pre-multiplied into the one-hot columns) is
  assembled OUTSIDE the kernel into one block-structured bf16 matrix;
* the kernel is then just: concat slot operands → per layer one
  ``X @ W_l`` (+ bias, ReLU between layers) → write the target block.

The layer output ``[bb, |out|*d_pad]`` IS the next layer's concatenated
input (the pruned plan chains ``out_slots == next.in_slots``), so no
shuffling happens between layers.  Numerics: bf16 MXU operands / f32
accumulation — the XLA path's own default matmul precision; one-hot
values are exact in bf16.

Reference behavior: mpqe/model.py ``RGCNEncoderDecoder.forward`` with
the TM/TGT readout (SURVEY.md §3.2; the reference mount was empty —
built from the behavioral spec, not copied).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..queries import STRUCTURES


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _plan(cfg, structure: str):
    from ..models import mpqe as mpqe_mod  # lazy: models imports ops

    spec = STRUCTURES[structure]
    steps = mpqe_mod.num_steps(cfg, structure)
    plan = mpqe_mod._live_slot_plan(spec, steps)
    anchors = set(spec.anchor_slots)
    in0 = plan[0][0]
    a_slots = tuple(s for s in in0 if s in anchors)
    v_slots = tuple(s for s in in0 if s not in anchors)
    return spec, steps, plan, a_slots, v_slots


def _var_layout(cfg, n_var: int, d_pad: int):
    """(packed, m8): packed=True when every variable slot's one-hot fits
    a disjoint ``m8``-wide column range of ONE d_pad-wide block."""
    m8 = _round_up(max(cfg.n_modes, 1), 8)
    return n_var * m8 <= d_pad, m8


def _layer_matrices(params, cfg, spec, steps, plan, a_slots, v_slots,
                    edge_rel, edge_norm, d_pad, fold_bias0=False):
    """Per-layer block weight matrix [k_l, n_l] (f32 — callers cast to
    bf16 for the kernel wire) + bias row [8, n_l] (f32), with edge_norm
    folded in and the variable-mode table pre-multiplied into layer-0
    one-hot columns.  Tiny XLA work.  Kept f32 and side-effect-free so
    the Pallas backward can ``jax.vjp`` through this assembly to recover
    exact dw_self/dbasis/dcoeff/dbias/dvar/dedge_norm from the kernel's
    f32 dW/db accumulators.

    ``fold_bias0``: layer 0's bias moves into W_0 at the packed one-hot
    block's first UNUSED column (the kernel sets that column to constant
    1), killing the widest per-block VPU bias add; layer 0's bias row is
    then zero.  Trades exact-f32 bias addition for a bf16-rounded bias
    (the W wire is bf16) — a measured-variant knob, off by default.

    Layer-0 row layout: one d_pad block per anchor slot (in ``a_slots``
    order), then the packed variable block (or one block per variable
    slot when packing does not fit).  Later layers follow the previous
    layer's out_slots order — which is exactly that layer's GEMM output.
    """
    from ..ops import rgcn as rgcn_ops

    d = cfg.embed_dim
    var_f32 = params["emb"]["var"].astype(jnp.float32)  # [n_modes, d]
    packed, m8 = _var_layout(cfg, len(v_slots), d_pad)
    n_a = len(a_slots)
    a_idx = {s: k for k, s in enumerate(a_slots)}
    v_idx = {s: k for k, s in enumerate(v_slots)}
    v0 = set(v_slots)

    def row0(s_in):
        """Layer-0 W row offset for slot s_in's operand block."""
        if s_in in v0:
            if packed:
                return n_a * d_pad + v_idx[s_in] * m8
            return (n_a + v_idx[s_in]) * d_pad
        return a_idx[s_in] * d_pad

    k0 = (n_a + 1 if packed else n_a + len(v_slots)) * d_pad
    Ws, biases = [], []
    for li, (in_slots, out_slots, edges) in enumerate(plan):
        lp = params["layers"][li]
        w_e = rgcn_ops._edge_weights(lp, edge_rel).astype(jnp.float32)
        w_e = w_e * edge_norm[:, None, None].astype(jnp.float32)
        w_self = lp["w_self"].astype(jnp.float32)
        icol = {s: k for k, s in enumerate(in_slots)}
        ocol = {s: k for k, s in enumerate(out_slots)}
        k_l = k0 if li == 0 else len(in_slots) * d_pad

        def put(W, s_in, s_out, w):
            # layer-0 variable inputs are one-hot columns: their rows
            # are the transformed mode table (select-then-matmul ==
            # matmul-then-select)
            if li == 0 and s_in in v0:
                w = jnp.dot(var_f32, w,
                            preferred_element_type=jnp.float32)  # [n_modes, d]
            r = row0(s_in) if li == 0 else icol[s_in] * d_pad
            c = ocol[s_out] * d_pad
            return W.at[r:r + w.shape[0], c:c + d].add(w)

        W = jnp.zeros((k_l, len(out_slots) * d_pad), jnp.float32)
        for s in out_slots:
            W = put(W, s, s, w_self)
        for j in edges:
            W = put(W, spec.edge_src[j], spec.edge_dst[j], w_e[j])
        fold = fold_bias0 and li == 0
        if fold:
            ones_row = n_a * d_pad + len(v_slots) * m8  # first unused col
            b_val = lp["bias"].astype(jnp.float32)
            for s in out_slots:
                W = W.at[ones_row,
                         ocol[s] * d_pad:ocol[s] * d_pad + d].add(b_val)
        Ws.append(W)

        bias = jnp.zeros((8, len(out_slots) * d_pad), jnp.float32)
        if not fold:
            for s in out_slots:
                bias = bias.at[0, ocol[s] * d_pad:ocol[s] * d_pad + d].set(
                    lp["bias"].astype(jnp.float32))
        biases.append(bias)
    return Ws, biases


def _make_kernel(steps, n_a, n_v, d_pad, packed, m8, oh_operand=False,
                 split_gemm=False, fold_bias=False, out_dtype=None):
    """Kernel closure; slot layout and the layer loop unroll at trace
    time.  refs: a_refs..., m_refs..., W_0..W_{L-1}, b_0..b_{L-1}, out.
    With ``oh_operand`` the packed variable one-hot block arrives as ONE
    prebuilt [bb, d_pad] bf16 ref (built by XLA outside) instead of n_v
    id columns expanded in-kernel — trades ~n_v VPU passes over
    [bb, d_pad] on the kernel's critical path for one extra bf16 operand
    DMA that the grid pipeline overlaps with compute.  With
    ``split_gemm`` layer 0 skips the ``jnp.concatenate`` of operand
    blocks (a [bb, n_ops*d_pad] VPU copy per grid step) and instead runs
    one GEMM per operand block against the matching d_pad-row slice of
    W_0, accumulated in f32 — identical MACs (the MXU consumes k=128
    panels either way), no copy."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    n_m = 1 if (oh_operand and n_v) else n_v

    def kernel(*refs):
        a_refs = refs[:n_a]
        m_refs = refs[n_a:n_a + n_m]
        w_refs = refs[n_a + n_m:n_a + n_m + steps]
        b_refs = refs[n_a + n_m + steps:n_a + n_m + 2 * steps]
        out_ref = refs[-1]
        bb = out_ref.shape[0]

        pieces = [a_refs[k][...] for k in range(n_a)]  # bf16 on the wire
        if n_v and oh_operand:
            pieces.append(m_refs[0][...])  # prebuilt packed one-hot
        elif n_v:
            iota = jax.lax.broadcasted_iota(jnp.int32, (bb, d_pad), 1)
            if packed:
                # all variable one-hots live in ONE block at disjoint
                # column offsets k*m8 (mode ids < n_modes <= m8)
                oh = (m_refs[0][:] == iota)
                for k in range(1, n_v):
                    oh = jnp.logical_or(oh, m_refs[k][:] + k * m8 == iota)
                if fold_bias:
                    # constant-1 column feeding W_0's folded bias row
                    oh = jnp.logical_or(oh, iota == n_v * m8)
                pieces.append(oh.astype(bf16))
            else:
                for k in range(n_v):
                    pieces.append((m_refs[k][:] == iota).astype(bf16))
        if split_gemm and len(pieces) > 1:
            # every layer-0 operand block occupies exactly d_pad rows of
            # W_0, in `pieces` order (anchors, then variable blocks —
            # see `row0`), so slice-and-accumulate replaces the concat
            y = jnp.dot(pieces[0], w_refs[0][0:d_pad, :],
                        preferred_element_type=f32)
            for k in range(1, len(pieces)):
                y = y + jnp.dot(pieces[k],
                                w_refs[0][k * d_pad:(k + 1) * d_pad, :],
                                preferred_element_type=f32)
            start = 1
        else:
            x = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=1)
            y = jnp.dot(x, w_refs[0][...], preferred_element_type=f32)
            start = 1
        if not fold_bias:  # folded: bias rides W_0's ones-column row
            y = y + b_refs[0][0:1, :]
        for li in range(start, steps):
            x = jnp.maximum(y, 0.0).astype(bf16)
            y = jnp.dot(x, w_refs[li][...], preferred_element_type=f32)
            y = y + b_refs[li][0:1, :]
        # the final layer's out_slots is exactly (target,) by plan
        # construction, so y is already the [bb, d_pad] target block
        out_ref[...] = y if out_dtype is None else y.astype(out_dtype)

    return kernel


def _make_multi_kernel(cfg, spec, steps, plan, a_slots, v_slots, d_pad,
                       m8, n_bases, r_pad):
    """Per-query-relation kernel closure (basis models only).

    Per block: the SELF transforms of every layer are still one shared
    GEMM against the edge-free ``_layer_matrices`` block (per-query
    relations change only the edge messages); each layer's messages run
    basis-first — per source slot ONE wide GEMM ``X_src @ [V_1|..|V_Bb]``
    ([bb, Bb*d_pad], bf16), then per edge a one-hot coefficient select
    ``onehot(rel_q) @ coeff`` (HIGHEST: selection of f32 rows is exact)
    and a Bb-pass VPU combine.  Layer-0 variable sources read the
    pre-multiplied ``var_table @ V_b`` operand through their mode
    one-hot, so no variable rows ever materialize.
    """
    f32, bf16 = jnp.float32, jnp.bfloat16
    n_a, n_v = len(a_slots), len(v_slots)
    anchors = set(spec.anchor_slots)
    a_idx = {s: k for k, s in enumerate(a_slots)}
    v_idx = {s: k for k, s in enumerate(v_slots)}
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        a_refs = refs[:n_a]
        m_refs = refs[n_a:n_a + n_v]
        rel_ref = refs[n_a + n_v]  # [bb, n_edges] int32
        norm_ref = refs[n_a + n_v + 1]  # [bb, n_edges] f32
        base = n_a + n_v + 2
        w_refs = refs[base:base + steps]  # self/bias blocks
        b_refs = refs[base + steps:base + 2 * steps]
        vw_refs = refs[base + 2 * steps:base + 3 * steps]  # [d_pad, Bb*d_pad]
        co_refs = refs[base + 3 * steps:base + 4 * steps]  # [r_pad, Bb]
        varv_ref = refs[base + 4 * steps]  # [d_pad, Bb*d_pad] (layer 0 vars)
        out_ref = refs[-1]
        bb = out_ref.shape[0]

        iota = jax.lax.broadcasted_iota(jnp.int32, (bb, d_pad), 1)
        # packed one-hot (self-GEMM operand, matches _layer_matrices
        # row layout) + per-var full-width one-hots (message operands)
        var_oh_full = {}
        pieces = [a_refs[k][...] for k in range(n_a)]
        if n_v:
            oh = (m_refs[0][:] == iota)
            var_oh_full[v_slots[0]] = oh.astype(bf16)
            for k in range(1, n_v):
                ohk = (m_refs[k][:] == iota)
                var_oh_full[v_slots[k]] = ohk.astype(bf16)
                oh = jnp.logical_or(oh, m_refs[k][:] + k * m8 == iota)
            pieces.append(oh.astype(bf16))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=1)

        rel_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, r_pad), 1)
        y = None
        for li, (in_slots, out_slots, edges) in enumerate(plan):
            icol = {s: k for k, s in enumerate(in_slots)}
            y = jnp.dot(x, w_refs[li][...], preferred_element_type=f32)
            y = y + b_refs[li][0:1, :]
            # messages, grouped by source slot (one wide GEMM each);
            # accumulated per DEST slot and concatenated once — an
            # in-place .at[].add on a column range would lower to a
            # scatter whose empty index constant pallas rejects
            acc = {s: None for s in out_slots}
            srcs = sorted({spec.edge_src[j] for j in edges})
            for s_src in srcs:
                if li == 0 and s_src not in anchors:
                    h = jnp.dot(var_oh_full[s_src], varv_ref[...],
                                preferred_element_type=f32)
                elif li == 0:
                    xs = pieces[a_idx[s_src]]
                    h = jnp.dot(xs, vw_refs[li][...],
                                preferred_element_type=f32)
                else:
                    c = icol[s_src] * d_pad
                    xs = x[:, c:c + d_pad]
                    h = jnp.dot(xs, vw_refs[li][...],
                                preferred_element_type=f32)
                # h: [bb, Bb*d_pad] f32
                for j in edges:
                    if spec.edge_src[j] != s_src:
                        continue
                    oh_rel = (rel_ref[:, j:j + 1] == rel_iota).astype(f32)
                    ce = jax.lax.dot(oh_rel, co_refs[li][...],
                                     precision=hp,
                                     preferred_element_type=f32)  # [bb, Bb]
                    msg = ce[:, 0:1] * h[:, 0:d_pad]
                    for b in range(1, n_bases):
                        msg = msg + ce[:, b:b + 1] * h[:, b * d_pad:
                                                       (b + 1) * d_pad]
                    msg = msg * norm_ref[:, j:j + 1]
                    s_dst = spec.edge_dst[j]
                    acc[s_dst] = msg if acc[s_dst] is None else \
                        acc[s_dst] + msg
            if any(a is not None for a in acc.values()):
                zeros = jnp.zeros((bb, d_pad), f32)
                m = jnp.concatenate(
                    [acc[s] if acc[s] is not None else zeros
                     for s in out_slots], axis=1)
                y = y + m
            if li < steps - 1:
                x = jnp.maximum(y, 0.0).astype(bf16)
        out_ref[...] = y

    return kernel


def fused_tgt_forward_multi(
    params: Dict[str, Any],
    cfg,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel_q: jax.Array,  # [B, n_edges] int32 — PER-QUERY relations
    edge_norm_q: jax.Array,  # [B, n_edges] float32
    *,
    block: int = 1024,
    interpret: bool = False,
    vmem_limit_mb: Optional[int] = None,
) -> jax.Array:
    """Per-query-relation fused forward → ``[B, d]`` (the Pallas
    counterpart of :func:`models.mpqe.encode_dense_multi`): one device
    call encodes queries of MANY formulas of the same structure, with
    the whole multi-layer plan in VMEM.  The production surfaces that
    encode with per-query relations (``evaluate_batched``, ``serve.py``
    bulk answering) route here on TPU.

    Basis-decomposed layers only (the per-query full-weight gather
    ``w_rel[rel] -> [B, d, do]`` cannot live in VMEM blocks); forward
    only (eval/serve surfaces do not differentiate).

    Reference behavior: per-formula eval scoring loop (SURVEY.md §3.4),
    batched across formulas; mount empty — built from the spec.
    """
    if cfg.readout != "tgt":
        raise ValueError("fused_tgt_forward_multi requires readout='tgt'")
    if cfg.num_bases is None:
        raise ValueError(
            "fused_tgt_forward_multi requires basis decomposition "
            "(use encode_dense_multi for full-weight models)")
    spec, steps, plan, a_slots, v_slots = _plan(cfg, structure)
    d = cfg.embed_dim
    d_pad = _round_up(d, 128)
    if cfg.n_modes > d_pad:
        raise ValueError("n_modes must fit the one-hot width (<= d_pad)")
    packed, m8 = _var_layout(cfg, len(v_slots), d_pad)
    if not packed:
        raise ValueError("variable slots exceed the packed one-hot block")
    B = node_mode.shape[0]
    bb = _round_up(min(block, B), 8)
    B_pad = _round_up(B, bb)
    n_bases = int(cfg.num_bases)
    r_pad = _round_up(cfg.n_rels, 128)

    def pad_rows(x, rows):
        if x.shape[0] == rows:
            return x
        return jnp.zeros((rows,) + x.shape[1:], x.dtype).at[:x.shape[0]].set(x)

    def pad2(x, r, c):
        if x.shape == (r, c):
            return x
        return jnp.zeros((r, c), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)

    inputs = []
    for s in a_slots:
        col = params["emb"]["ent"][node_entity[:, s]]
        inputs.append(pad2(pad_rows(col.astype(jnp.bfloat16), B_pad),
                           B_pad, d_pad))
    for s in v_slots:
        inputs.append(pad_rows(node_mode[:, s:s + 1].astype(jnp.int32),
                               B_pad))
    inputs.append(pad_rows(edge_rel_q.astype(jnp.int32), B_pad))
    inputs.append(pad_rows(edge_norm_q.astype(jnp.float32), B_pad))

    # self/bias blocks: _layer_matrices with edge-free plans (per-query
    # relations change only the messages)
    plan_self = [(ins, outs, ()) for ins, outs, _ in plan]
    Ws, biases = _layer_matrices(
        params, cfg, spec, steps, plan_self, a_slots, v_slots,
        jnp.zeros((spec.n_edges,), jnp.int32),
        jnp.ones((spec.n_edges,), jnp.float32), d_pad)
    inputs += [W.astype(jnp.bfloat16) for W in Ws]
    inputs += list(biases)

    # wide basis operands [d_pad, Bb*d_pad] per layer + coeff tables
    vw_list, co_list = [], []
    for li in range(steps):
        lp = params["layers"][li]
        basis = lp["basis"].astype(jnp.float32)  # [Bb, d, d_out]
        vw = jnp.zeros((d_pad, n_bases * d_pad), jnp.float32)
        for b in range(n_bases):
            vw = vw.at[:d, b * d_pad:b * d_pad + basis.shape[2]].set(basis[b])
        vw_list.append(vw.astype(jnp.bfloat16))
        co = jnp.zeros((r_pad, n_bases), jnp.float32)
        co = co.at[:cfg.n_rels].set(lp["coeff"].astype(jnp.float32))
        co_list.append(co)
    inputs += vw_list + co_list

    # layer-0 variable-source operand: var_table premultiplied into the
    # wide basis block (rows = modes at full one-hot width)
    var_f32 = params["emb"]["var"].astype(jnp.float32)  # [n_modes, d]
    varv = jnp.zeros((d_pad, n_bases * d_pad), jnp.float32)
    b0 = params["layers"][0]["basis"].astype(jnp.float32)
    for b in range(n_bases):
        varv = varv.at[:cfg.n_modes, b * d_pad:b * d_pad + b0.shape[2]].set(
            jnp.dot(var_f32, b0[b], preferred_element_type=jnp.float32))
    inputs.append(varv.astype(jnp.bfloat16))

    in_specs = (
        [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for _ in a_slots]
        + [pl.BlockSpec((bb, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in v_slots]
        + [pl.BlockSpec((bb, spec.n_edges), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(W.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for W in Ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in biases]
        + [pl.BlockSpec(v.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for v in vw_list]
        + [pl.BlockSpec(c.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in co_list]
        + [pl.BlockSpec(varv.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    out = pl.pallas_call(
        _make_multi_kernel(cfg, spec, steps, plan, a_slots, v_slots,
                           d_pad, m8, n_bases, r_pad),
        grid=(B_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, d_pad), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs)
    return out[:B, :d].astype(cfg.dtype)


def _make_bwd_kernel(steps, n_a, n_v, d_pad, packed, m8,
                     wire=jnp.bfloat16):
    """Backward kernel closure (default concat layout only).

    Per grid block: recompute the forward chain entirely in VMEM
    (activations never touch HBM — same trade as the blocked kernel's
    grad path), then walk it backwards:

      dW_l += X_l^T @ g_l        (f32 VMEM accumulator, constant index)
      db_l += sum_rows(g_l)
      g_{l-1} = (g_l @ W_l^T) * relu'(Y_{l-1})
      dA_k   = (g_0 @ W_0^T)[:, k*d_pad:(k+1)*d_pad]   (anchor operands)

    The layer-0 one-hot rows of dW_0 carry the variable-table gradient;
    :func:`fused_tgt_backward` maps dW/db back to the parameter pytree by
    ``jax.vjp`` through :func:`_layer_matrices` (its assembly is linear in
    the params, so the transpose is exact).

    ``wire=jnp.float32`` disables the bf16 operand casts (testing only:
    separates structural correctness from MXU-operand rounding).
    """
    f32, bf16 = jnp.float32, wire

    def kernel(*refs):
        a_refs = refs[:n_a]
        m_refs = refs[n_a:n_a + n_v]
        w_refs = refs[n_a + n_v:n_a + n_v + steps]
        b_refs = refs[n_a + n_v + steps:n_a + n_v + 2 * steps]
        g_ref = refs[n_a + n_v + 2 * steps]
        da_refs = refs[n_a + n_v + 2 * steps + 1:
                       n_a + n_v + 2 * steps + 1 + n_a]
        dw_refs = refs[-2 * steps:-steps]
        db_refs = refs[-steps:]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in dw_refs:
                r[...] = jnp.zeros_like(r)
            for r in db_refs:
                r[...] = jnp.zeros_like(r)

        bb = g_ref.shape[0]
        # ---- recompute the forward, keeping X_l (bf16) and pre-relu Y_l
        pieces = [a_refs[k][...] for k in range(n_a)]
        if n_v:
            iota = jax.lax.broadcasted_iota(jnp.int32, (bb, d_pad), 1)
            if packed:
                oh = (m_refs[0][:] == iota)
                for k in range(1, n_v):
                    oh = jnp.logical_or(oh, m_refs[k][:] + k * m8 == iota)
                pieces.append(oh.astype(bf16))
            else:
                for k in range(n_v):
                    pieces.append((m_refs[k][:] == iota).astype(bf16))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=1)
        xs, ys = [x], []
        for li in range(steps):
            y = jnp.dot(x, w_refs[li][...], preferred_element_type=f32)
            y = y + b_refs[li][0:1, :]
            ys.append(y)
            if li < steps - 1:
                x = jnp.maximum(y, 0.0).astype(bf16)
                xs.append(x)

        # ---- reverse sweep
        g = g_ref[...]  # [bb, d_pad] f32
        for li in range(steps - 1, -1, -1):
            gb = g.astype(bf16)
            # X_l^T @ g_l: contract the row (batch) dim of both operands
            dw_refs[li][...] += jax.lax.dot_general(
                xs[li], gb, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db_refs[li][0:1, :] += jnp.sum(g, axis=0, keepdims=True)
            # g_l @ W_l^T ([bb, k_l]).  Numerics note (measured round 4,
            # tools/fused_bwd_diag.py): early-layer grads of this model
            # are relu-mask-sensitive — Y_0 elements near zero flip the
            # mask under different matmul precisions, so ANY two
            # precision variants differ by ~0.15 in max-element norm on
            # layer-0 grads (the on-chip XLA VJP at HIGHEST vs DEFAULT
            # precision differs from ITSELF by that much).  Compiled
            # parity is therefore gated against the oracle's own
            # precision envelope (tools/tpu_smoke.py), not a fixed atol.
            dx = jnp.dot(gb, w_refs[li][...].T,
                         preferred_element_type=f32)  # [bb, k_l]
            if li > 0:
                g = dx * (ys[li - 1] > 0.0).astype(f32)
            else:
                for k in range(n_a):
                    da_refs[k][...] = dx[:, k * d_pad:(k + 1) * d_pad]

    return kernel


def fused_tgt_backward(
    params: Dict[str, Any],
    cfg,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel: jax.Array,  # [n_edges] int32
    edge_norm: jax.Array,  # [n_edges] float32
    anchor_rows,  # None | [B, A, d] | tuple of per-slot [B, d]
    g: jax.Array,  # [B, d] output cotangent
    *,
    block: int = 1024,
    interpret: bool = False,
    vmem_limit_mb: Optional[int] = None,
    f32_wire: bool = False,
):
    """Pallas backward for :func:`fused_tgt_forward`.

    Returns ``(dparams, dedge_norm, danchor_rows)`` — the cotangents of
    the differentiable inputs.  Anchor-row cotangents from the kernel
    feed the ordinary gather transpose (an XLA scatter-add into the
    entity table) when ``anchor_rows is None``; parameter and edge-norm
    cotangents come from ``jax.vjp`` through the (linear) weight-matrix
    assembly, so they are exact transposes of what the forward computed.

    Numerics: bf16 MXU operands with f32 accumulation — the same class
    as the XLA path's default-precision backward; parity is tolerance-
    tested, not bit-exact (the XLA-recompute backward in
    ``models.mpqe._encode_dense_fused_bwd`` remains the bit-exact-to-
    ``encode_dense`` option).

    Reference behavior: the autograd backward of mpqe/model.py's forward
    (SURVEY.md §3.3; mount empty — built from the behavioral spec).
    """
    if cfg.readout != "tgt":
        raise ValueError("fused_tgt_backward requires readout='tgt'")
    spec, steps, plan, a_slots, v_slots = _plan(cfg, structure)
    d = cfg.embed_dim
    d_pad = _round_up(d, 128)
    B = node_mode.shape[0]
    bb = _round_up(min(block, B), 8)
    B_pad = _round_up(B, bb)
    packed, m8 = _var_layout(cfg, len(v_slots), d_pad)

    def pad_rows(x, rows):
        if x.shape[0] == rows:
            return x
        return jnp.zeros((rows,) + x.shape[1:], x.dtype).at[:x.shape[0]].set(x)

    def pad2(x, r, c):
        if x.shape == (r, c):
            return x
        return jnp.zeros((r, c), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)

    is_seq = isinstance(anchor_rows, (tuple, list))

    def assemble(p, en, ar):
        """Differentiable input assembly (f32, no kernel-wire casts):
        per-anchor [B, d] columns + layer matrices/biases."""
        if ar is None:
            cols = tuple(p["emb"]["ent"][node_entity[:, s]].astype(
                jnp.float32) for s in a_slots)
        elif is_seq:
            cols = tuple(c.astype(jnp.float32) for c in ar)
        else:
            cols = tuple(ar[:, k, :].astype(jnp.float32)
                         for k in range(len(a_slots)))
        Ws, biases = _layer_matrices(
            p, cfg, spec, steps, plan, a_slots, v_slots, edge_rel, en,
            d_pad)
        return cols, tuple(Ws), tuple(biases)

    (cols, Ws, biases), vjp_assemble = jax.vjp(
        assemble, params, edge_norm, anchor_rows)

    wire = jnp.float32 if f32_wire else jnp.bfloat16
    inputs = [pad2(pad_rows(c.astype(wire), B_pad), B_pad, d_pad)
              for c in cols]
    for s in v_slots:
        inputs.append(pad_rows(node_mode[:, s:s + 1].astype(jnp.int32),
                               B_pad))
    inputs += [W.astype(wire) for W in Ws]
    inputs += list(biases)
    g_pad = pad2(pad_rows(g.astype(jnp.float32), B_pad), B_pad, d_pad)
    inputs.append(g_pad)

    in_specs = (
        [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for _ in a_slots]
        + [pl.BlockSpec((bb, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in v_slots]
        + [pl.BlockSpec(W.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for W in Ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in biases]
        + [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_specs = (
        [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for _ in a_slots]
        + [pl.BlockSpec(W.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for W in Ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in biases]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((B_pad, d_pad), jnp.float32) for _ in a_slots]
        + [jax.ShapeDtypeStruct(W.shape, jnp.float32) for W in Ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in biases]
    )
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    outs = pl.pallas_call(
        _make_bwd_kernel(steps, len(a_slots), len(v_slots), d_pad, packed,
                         m8, wire=wire),
        grid=(B_pad // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs)

    n_a = len(a_slots)
    d_cols = tuple(outs[k][:B, :d] for k in range(n_a))
    d_Ws = tuple(outs[n_a:n_a + steps])
    d_biases = tuple(outs[n_a + steps:])
    dparams, dedge_norm, danchor_rows = vjp_assemble(
        (d_cols, d_Ws, d_biases))
    return dparams, dedge_norm, danchor_rows


def fused_tgt_forward(
    params: Dict[str, Any],
    cfg,
    structure: str,  # static
    node_entity: jax.Array,  # [B, n] int32
    node_mode: jax.Array,  # [B, n] int32
    edge_rel: jax.Array,  # [n_edges] int32
    edge_norm: jax.Array,  # [n_edges] float32
    anchor_rows: Optional[jax.Array] = None,  # [B, A, d] pre-gathered
    *,
    block: int = 2048,
    interpret: bool = False,
    onehot_operand: bool = False,
    split_gemm: bool = False,
    vmem_limit_mb: Optional[int] = None,
    fold_bias: bool = False,
    out_bf16: bool = False,
) -> jax.Array:
    """Whole pruned TGT forward as one Pallas kernel → ``[B, d]`` f32.

    Forward only — wrap via :func:`models.mpqe.encode_dense_fused` for a
    differentiable version (its backward recomputes through the XLA
    path, so gradients are bit-identical to ``encode_dense``'s).

    Measured-variant knobs (roofline hunt, BASELINE.md): ``fold_bias``
    moves layer-0's bias into W_0 through a constant-1 column of the
    packed one-hot block (kills the widest VPU bias add; bias rounds to
    the bf16 wire); ``out_bf16`` writes the output block in bf16
    (halves the final-write HBM traffic; for cfg.dtype=bfloat16 the
    result is identical to casting after).
    """
    if cfg.readout != "tgt":
        raise ValueError("fused_tgt_forward requires readout='tgt'")
    if cfg.dtype not in (jnp.float32, jnp.bfloat16):
        # f32: kernel keeps f32 accumulators and bf16 MXU operands —
        # the XLA path's own default matmul numerics.  bf16: the kernel
        # ALREADY casts inter-layer activations to bf16 (relu-then-cast
        # == cast-then-relu: monotone, 0 exact), which is exactly what
        # cfg.dtype=bfloat16 means on the XLA path — parity pinned in
        # tests/test_pallas_fused_fwd.py::test_fused_fwd_bf16_config
        raise ValueError(
            "fused_tgt_forward requires cfg.dtype in {float32, bfloat16}")
    spec, steps, plan, a_slots, v_slots = _plan(cfg, structure)
    d = cfg.embed_dim
    d_pad = _round_up(d, 128)
    if cfg.n_modes > d_pad:
        raise ValueError("n_modes must fit the one-hot width (<= d_pad)")
    B = node_mode.shape[0]
    bb = _round_up(min(block, B), 8)  # VMEM tiles are 8-row aligned
    B_pad = _round_up(B, bb)
    packed, m8 = _var_layout(cfg, len(v_slots), d_pad)

    def pad_rows(x, rows):
        if x.shape[0] == rows:
            return x
        return jnp.zeros((rows,) + x.shape[1:], x.dtype).at[:x.shape[0]].set(x)

    def pad2(x, r, c):
        if x.shape == (r, c):
            return x
        return jnp.zeros((r, c), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)

    inputs = []
    for k, s in enumerate(a_slots):
        if anchor_rows is None:
            col = params["emb"]["ent"][node_entity[:, s]]
        elif isinstance(anchor_rows, (tuple, list)):
            # per-slot [B, d] arrays (zero-copy: no [B, A, d] re-slice)
            col = anchor_rows[k]
        else:
            col = anchor_rows[:, k, :]
        # bf16 on the wire: the MXU reads bf16 operands anyway (cast
        # before the DMA instead of after — in a single-shot encode XLA
        # fuses the cast into the gather), and anchor reads are the
        # kernel's dominant HBM traffic
        inputs.append(pad2(pad_rows(col.astype(jnp.bfloat16), B_pad),
                           B_pad, d_pad))
    if fold_bias and not (packed and v_slots
                          and len(v_slots) * m8 < d_pad):
        raise ValueError(
            "fold_bias needs a free column in the packed one-hot block "
            "(packed layout with n_var * round_up(n_modes, 8) < d_pad)")
    oh_operand = bool(onehot_operand and packed and v_slots)
    if oh_operand:
        # build the packed one-hot block OUTSIDE (XLA): column
        # v_idx*m8 + mode per variable slot — the kernel then reads it
        # as one bf16 operand the grid pipeline overlaps, instead of
        # expanding n_v id columns on its critical path
        ids = node_mode[:, list(v_slots)].astype(jnp.int32)  # [B, n_v]
        pos = ids + jnp.arange(len(v_slots), dtype=jnp.int32)[None, :] * m8
        iota = jnp.arange(d_pad, dtype=jnp.int32)
        oh = (pos[:, :, None] == iota[None, None, :]).any(axis=1)
        if fold_bias:
            oh = jnp.logical_or(oh, iota[None, :] == len(v_slots) * m8)
        inputs.append(pad_rows(oh.astype(jnp.bfloat16), B_pad))
        var_specs = [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        for s in v_slots:
            inputs.append(pad_rows(node_mode[:, s:s + 1].astype(jnp.int32),
                                   B_pad))
        var_specs = [pl.BlockSpec((bb, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM) for _ in v_slots]
    Ws, biases = _layer_matrices(
        params, cfg, spec, steps, plan, a_slots, v_slots, edge_rel,
        edge_norm, d_pad, fold_bias0=fold_bias)
    Ws = [W.astype(jnp.bfloat16) for W in Ws]
    inputs += Ws + biases

    in_specs = (
        [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for _ in a_slots]
        + var_specs
        + [pl.BlockSpec(W.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for W in Ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in biases]
    )
    # Mosaic's default scoped-VMEM limit is 16 MiB — conservative against
    # the chip's physical VMEM (128 MiB on v5e).  Variants that keep more
    # blocks live (split_gemm's per-operand accumulation, block > 2048)
    # need the limit raised; callers opt in via ``vmem_limit_mb``.
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    out = pl.pallas_call(
        _make_kernel(steps, len(a_slots), len(v_slots), d_pad, packed, m8,
                     oh_operand=oh_operand, split_gemm=split_gemm,
                     fold_bias=fold_bias,
                     out_dtype=jnp.bfloat16 if out_bf16 else None),
        grid=(B_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, d_pad), out_dtype),
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs)
    return out[:B, :d].astype(cfg.dtype)
