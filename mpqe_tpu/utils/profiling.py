"""Profiling & timing: relay-safe timers, jax.profiler traces, rooflines.

The reference has no profiling subsystem (SURVEY.md §5).  This module is
the TPU build's: a timing harness that stays correct on remote-relay
backends (where ``block_until_ready`` can return before execution — see
bench.py), a ``jax.profiler`` trace context for TensorBoard, and a v5e
roofline estimator for the R-GCN forward so measured edges/s can be
compared against speed-of-light.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import numpy as np


# v5e per-chip peaks (public figures)
TPU_V5E_BF16_FLOPS = 197e12
TPU_V5E_FP32_FLOPS = 49e12  # fp32 via 4 bf16 passes (approx)
TPU_V5E_HBM_GBS = 819e9


def loop_time(
    step_fn: Callable,
    n_small: int = 5,
    n_large: int = 55,
    samples: int = 3,
    log: Callable[[str], None] = lambda m: None,
) -> float:
    """Overhead-cancelled seconds/iteration for ``step_fn(n) -> scalar``.

    ``step_fn`` must run its workload n times *inside one jitted call*
    (lax.fori_loop with a threaded data dependency) and return a scalar;
    the float() conversion here is the only reliable sync on relay
    backends.

    The relay occasionally charges a one-off stall to a single call,
    which can make t(n_small) exceed t(n_large); a floored delta once
    reported a physically impossible 0.000 ms forward.  This takes up to
    ``samples + 2`` paired measurements, keeps the positive deltas, and
    returns their median — raising if every delta is non-positive so a
    broken measurement fails loudly instead of recording garbage.
    """
    float(step_fn(2))  # compile + sync
    deltas = []
    for _ in range(samples + 2):
        t0 = time.perf_counter()
        float(step_fn(n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(step_fn(n_large))
        t_large = time.perf_counter() - t0
        dt = (t_large - t_small) / (n_large - n_small)
        if dt > 0:
            deltas.append(dt)
        else:
            log(f"  timing retry: t({n_small})={t_small:.4f}s >= "
                f"t({n_large})={t_large:.4f}s")
        if len(deltas) >= samples:
            break
    if not deltas:
        raise RuntimeError(
            "loop_time: every overhead-cancelled delta was non-positive "
            "(relay stalls?); refusing to report a garbage time")
    deltas.sort()
    log(f"  samples(ms): {['%.3f' % (d*1e3) for d in deltas]}")
    return deltas[len(deltas) // 2]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mpqe_trace"):
    """jax.profiler trace context (view with TensorBoard)."""
    try:
        jax.profiler.start_trace(log_dir)
        yield log_dir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


@dataclasses.dataclass
class RGCNRoofline:
    """Speed-of-light analysis of one dense-template R-GCN forward."""

    flops: float
    hbm_bytes: float
    compute_s: float
    memory_s: float

    @property
    def bound(self) -> str:
        return "memory" if self.memory_s > self.compute_s else "compute"

    @property
    def min_seconds(self) -> float:
        return max(self.compute_s, self.memory_s)


def rgcn_dense_roofline(
    batch: int,
    n_nodes: int,
    n_edges: int,
    steps: int,
    d: int,
    n_entities: int,
    dtype_bytes: int = 4,
    flops_peak: float = TPU_V5E_FP32_FLOPS,
    hbm_peak: float = TPU_V5E_HBM_GBS,
) -> RGCNRoofline:
    """FLOPs: per step, self-loop [B*n, d]@[d, d] + n_edges [B, d]@[d, d].
    HBM: embedding gather (B*n rows) + activations per step (read+write)."""
    flops = 2.0 * steps * batch * d * d * (n_nodes + n_edges)
    act = batch * n_nodes * d * dtype_bytes
    hbm = act  # initial gather write
    hbm += batch * n_nodes * dtype_bytes * 2  # index reads (int32)
    hbm += act  # embedding rows read from the table
    hbm += steps * 2 * act  # per-step activation read+write (upper bound;
    # XLA fusion usually keeps intermediates on-chip, so this is pessimistic)
    return RGCNRoofline(
        flops=flops,
        hbm_bytes=hbm,
        compute_s=flops / flops_peak,
        memory_s=hbm / hbm_peak,
    )


def mpqe_fwd_roofline(
    batch: int,
    cfg,
    structure: str,
    flops_peak: float = TPU_V5E_BF16_FLOPS,
    hbm_peak: float = TPU_V5E_HBM_GBS,
    impl: str = "xla",
) -> RGCNRoofline:
    """Speed-of-light for the PRODUCTION MPQE dense forward — accounts
    for the dead-slot-pruned TGT plan and the one-hot variable-slot
    formulation (models/mpqe.py _encode_dense_tgt_pruned) so the
    roofline fraction reported by bench.py reflects the program that
    actually runs.

    FLOPs: layer-0 terms whose source is a variable slot run as a tiny
    [n_modes, d] @ [d, d] transform plus a [B, n_modes] one-hot MXU
    matmul; everything else is a full [B, d] @ [d, d].  The default
    TPU matmul precision truncates f32 inputs to bf16, so the compute
    peak is the bf16 rate.

    Bytes: COMPULSORY traffic only — anchor entity-row gather reads,
    one-hot operands, int32 id reads, and the final query-vector write.
    Inter-layer activations may or may not round-trip HBM depending on
    XLA's fusion choices, so this bound is optimistic (a true speed of
    light): fractions near 1 mean the program is as good as if every
    intermediate stayed on-chip.
    """
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.queries import STRUCTURES

    spec = STRUCTURES[structure]
    steps = mpqe_mod.num_steps(cfg, structure)
    d = cfg.embed_dim
    if cfg.readout == "tgt":
        plan = mpqe_mod._live_slot_plan(spec, steps)
    else:
        all_slots = tuple(range(spec.n_nodes))
        plan = [(all_slots, all_slots, tuple(range(spec.n_edges)))] * steps
    n_self = sum(len(out) for _, out, _ in plan)
    n_msgs = sum(len(edges) for _, _, edges in plan)
    anchors = set(spec.anchor_slots)
    n_anchor_gathers = len([s for s in plan[0][0] if s in anchors])
    var0 = set(plan[0][0]) - anchors
    row = batch * d * 4

    if impl == "fused_fwd":
        # ops/pallas_fused_fwd: bf16 anchor rows + int32 mode ids in,
        # f32 target block out; FLOPs are the padded-block layer GEMMs
        # the kernel actually issues (one per layer, zero blocks
        # included) — at the flagship shape this bound is COMPUTE, so
        # its fraction is not comparable to the xla model's
        from ..ops import pallas_fused_fwd as pff

        d_pad = pff._round_up(d, 128)
        packed, _ = pff._var_layout(cfg, len(var0), d_pad)
        k0 = (n_anchor_gathers + (1 if packed else len(var0))) * d_pad
        flops = 0.0
        for li, (in_slots, out_slots, _) in enumerate(plan):
            k_l = k0 if li == 0 else len(in_slots) * d_pad
            flops += 2.0 * batch * k_l * len(out_slots) * d_pad
        hbm = n_anchor_gathers * batch * d_pad * 2  # bf16 anchor reads
        hbm += batch * len(var0) * 4  # int32 mode-id reads
        hbm += batch * d_pad * 4  # f32 target-block write
    else:
        l0_in, l0_out, l0_edges = plan[0]
        n_var_terms = (sum(1 for s in l0_out if s in var0)
                       + sum(1 for j in l0_edges
                             if spec.edge_src[j] in var0))
        flops = 2.0 * batch * d * d * (n_self + n_msgs - n_var_terms)
        flops += 2.0 * batch * cfg.n_modes * d * n_var_terms  # one-hots
        hbm = n_anchor_gathers * row  # compulsory entity-row reads
        hbm += batch * len(var0) * cfg.n_modes * 4  # one-hot operands
        hbm += batch * spec.n_nodes * 2 * 4  # int32 id/mode reads
        hbm += row  # final query vector write
    return RGCNRoofline(
        flops=flops,
        hbm_bytes=hbm,
        compute_s=flops / flops_peak,
        memory_s=hbm / hbm_peak,
    )


class StepTimer:
    """Lightweight wall-clock step timer with percentile summaries for the
    training loop's JSONL metrics."""

    def __init__(self):
        self.samples: list = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p95_s": float(np.percentile(a, 95)),
        }
