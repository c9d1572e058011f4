"""Fused whole-forward Pallas kernel for the dense TGT template path.

The XLA pruned forward (models/mpqe.py ``_encode_dense_tgt_pruned``) is
memory-bound at the flagship shape, and the round-3 trace attribution
showed the remaining gap to the compulsory-traffic roofline is a couple
of ``[B, d]`` activation round-trips XLA materializes between layers.
This kernel runs the ENTIRE multi-layer pruned forward for a block of
queries without leaving VMEM: per grid step it loads the block's anchor
entity rows (the only large inputs), builds variable-slot operands from
per-row mode ids as one-hot MXU matrices, runs every layer's slot GEMMs
against VMEM-resident weights, and writes only the final ``[block, d]``
target vectors back to HBM — compulsory traffic only.

Numerics: matmuls run with bf16 operands / f32 accumulation, exactly the
XLA path's default TPU matmul precision, so parity with
``encode_dense(readout='tgt')`` holds to bf16 tolerance (and the one-hot
selections are exact — 0.0/1.0 are exact in bf16).  ``edge_norm`` is
folded into the per-edge weights before the kernel
(``(x @ W) * c == x @ (W * c)`` up to f32 rounding).

Reference behavior: mpqe/model.py ``RGCNEncoderDecoder.forward`` with the
TM/TGT readout (SURVEY.md §3.2; the reference mount was empty — built
from the behavioral spec, not copied).
"""

from __future__ import annotations

import functools
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


def _make_kernel(spec, steps, plan, a_slots, v_slots, m_pad, n_edges):
    """Kernel closure; the whole layer plan is unrolled at trace time."""
    n_a, n_v = len(a_slots), len(v_slots)
    f32, bf16 = jnp.float32, jnp.bfloat16

    def kernel(*refs):
        a_refs = refs[:n_a]
        m_refs = refs[n_a:n_a + n_v]
        var_ref, wself_ref, bias_ref, we_ref, out_ref = refs[n_a + n_v:]
        bb = out_ref.shape[0]

        xs = {s: a_refs[k][...] for k, s in enumerate(a_slots)}
        oh: Dict[int, jax.Array] = {}
        if n_v:
            iota = jax.lax.broadcasted_iota(jnp.int32, (bb, m_pad), 1)
            for k, s in enumerate(v_slots):
                oh[s] = (m_refs[k][:] == iota).astype(bf16)
        vt = var_ref[...].astype(bf16)  # [m_pad, d_pad]

        for li, (in_slots, out_slots, edges) in enumerate(plan):
            last = li == steps - 1
            wself = wself_ref[li].astype(bf16)

            def term(s, w):
                if s in xs:
                    return jnp.dot(xs[s].astype(bf16), w,
                                   preferred_element_type=f32)
                # layer-0 variable slot: factored one-hot selection of the
                # transformed (tiny) mode table — matmul-then-select ==
                # select-then-matmul
                mini = jnp.dot(vt, w, preferred_element_type=f32)
                return jnp.dot(oh[s], mini.astype(bf16),
                               preferred_element_type=f32)

            nxt = {}
            for s in out_slots:
                acc = term(s, wself)
                for j in edges:
                    if spec.edge_dst[j] != s:
                        continue
                    acc = acc + term(spec.edge_src[j],
                                     we_ref[li * n_edges + j].astype(bf16))
                acc = acc + bias_ref[li:li + 1, :]
                nxt[s] = acc if last else jnp.maximum(acc, 0.0)
            xs = nxt
            oh = {}
        out_ref[...] = xs[spec.target_slot]

    return kernel


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
    block: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Whole pruned TGT forward as one Pallas kernel → ``[B, d]`` f32.

    Forward only — wrap via :func:`models.mpqe.encode_dense_fused` for a
    differentiable version (its backward recomputes through the XLA
    path, so gradients are bit-identical to ``encode_dense``'s).
    """
    from ..ops import rgcn as rgcn_ops  # lazy (module cycle hygiene)

    if cfg.readout != "tgt":
        raise ValueError("fused_tgt_forward requires readout='tgt'")
    spec, steps, plan, a_slots, v_slots = _plan(cfg, structure)
    d = cfg.embed_dim
    d_pad = _round_up(d, 128)
    m_pad = max(8, _round_up(cfg.n_modes, 8))
    B = node_mode.shape[0]
    bb = min(block, _round_up(B, 8))
    B_pad = _round_up(B, bb)
    n_edges = spec.n_edges

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
        col = (anchor_rows[:, k, :] if anchor_rows is not None
               else params["emb"]["ent"][node_entity[:, s]])
        inputs.append(pad2(pad_rows(col.astype(jnp.float32), B_pad),
                           B_pad, d_pad))
    for s in v_slots:
        inputs.append(pad_rows(node_mode[:, s:s + 1].astype(jnp.int32),
                               B_pad))
    inputs.append(pad2(params["emb"]["var"].astype(jnp.float32),
                       m_pad, d_pad))

    wself = jnp.stack([params["layers"][li]["w_self"]
                       for li in range(steps)]).astype(jnp.float32)
    wself_p = jnp.zeros((steps, d_pad, d_pad), jnp.float32
                        ).at[:, :d, :d].set(wself)
    bias = jnp.stack([params["layers"][li]["bias"]
                      for li in range(steps)]).astype(jnp.float32)
    bias_p = pad2(bias, max(8, steps), d_pad)
    # per-layer per-edge weights with edge_norm folded in (tiny einsums)
    we = jnp.concatenate([
        rgcn_ops._edge_weights(params["layers"][li], edge_rel)
        * edge_norm[:, None, None].astype(jnp.float32)
        for li in range(steps)
    ]).astype(jnp.float32)  # [steps * n_edges, d, d]
    we_p = jnp.zeros((steps * n_edges, d_pad, d_pad), jnp.float32
                     ).at[:, :d, :d].set(we)
    inputs += [wself_p, bias_p, we_p]

    in_specs = (
        [pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for _ in a_slots]
        + [pl.BlockSpec((bb, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in v_slots]
        + [
            pl.BlockSpec((m_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d_pad, d_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(8, steps), d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps * n_edges, d_pad, d_pad),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        _make_kernel(spec, steps, plan, a_slots, v_slots, m_pad, n_edges),
        grid=(B_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, d_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out[:B, :d].astype(cfg.dtype)
