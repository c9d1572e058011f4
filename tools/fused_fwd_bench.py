#!/usr/bin/env python
"""Fused whole-forward Pallas kernel vs the XLA pruned forward on the
real chip, flagship shape (bench.py's workload + timing methodology:
jitted fori_loop with threaded data dependency, overhead-cancelled).

Usage: python tools/fused_fwd_bench.py [--blocks 1024,2048,4096]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D = 128
N_ENTITIES = 1_000_000
N_MODES = 4
N_RELS = 266
NUM_BASES = 16
N_LAYERS = 3
STRUCTURE = "3-chain_inter"
BATCH = 131_072


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed_loop(loop_fn, *args, n_small=5, n_large=255, samples=3):
    """Shared relay-safe protocol: median of positive overhead-cancelled
    deltas (utils/profiling.loop_time) — one implementation for every
    bench so numbers stay comparable."""
    from mpqe_tpu.utils import profiling
    return profiling.loop_time(
        lambda n: loop_fn(*args, n),
        n_small=n_small, n_large=n_large, samples=samples, log=log)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="1024,2048,4096")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--oh_operand", action="store_true",
                    help="also time the onehot_operand=True variant "
                         "(prebuilt packed one-hot as a bf16 operand)")
    ap.add_argument("--split_gemm", action="store_true",
                    help="also time split_gemm=True (per-operand-block "
                         "layer-0 GEMMs instead of the VPU concat), "
                         "with and without oh_operand")
    ap.add_argument("--skip_base", action="store_true",
                    help="skip the XLA + default-fused timings (each is "
                         "a multi-minute relay compile) and only time "
                         "the requested variants")
    ap.add_argument("--train_bwd", action="store_true",
                    help="time full train steps (fwd+bwd+Adam): dense vs "
                         "fused_fwd backward=xla vs backward=pallas at "
                         "each --bwd_blocks size")
    ap.add_argument("--bwd_blocks", default="512,1024,2048")
    ap.add_argument("--skip_train_base", action="store_true",
                    help="with --train_bwd: skip the dense + backward="
                         "xla baselines (use BASELINE.md's 42.0/42.6 ms)")
    ap.add_argument("--vmem_mb", type=int, default=24,
                    help="scoped-vmem limit for the --variants sweep "
                         "(raise for block>=8192: the base kernel needs "
                         "~17.8M at 4096, ~2x per doubling)")
    ap.add_argument("--multi_vmem_mb", type=int, default=100,
                    help="scoped-vmem limit for the multi-kernel sweep "
                         "(0 = Mosaic default 16 MB, which the kernel "
                         "overflows at block>=512)")
    ap.add_argument("--multi", action="store_true",
                    help="time the per-query-relation fused multi kernel "
                         "vs encode_dense_multi (the eval/serve encode)")
    ap.add_argument("--variants", action="store_true",
                    help="time the round-4 roofline-hunt variants at each "
                         "--blocks size: fold_bias (layer-0 bias folded "
                         "into W_0 via a constant-1 one-hot column) and "
                         "out_bf16 (bf16 output block write)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.queries import STRUCTURES

    spec = STRUCTURES[STRUCTURE]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=N_ENTITIES, n_modes=N_MODES, n_rels=N_RELS,
        embed_dim=D, n_layers=N_LAYERS, num_bases=NUM_BASES, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = args.batch
    node_entity = jnp.asarray(
        rng.integers(0, N_ENTITIES, (B, spec.n_nodes)).astype(np.int32))
    node_mode = jnp.asarray(
        rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
    edge_rel = jnp.asarray(
        rng.integers(0, N_RELS, (spec.n_edges,)).astype(np.int32))
    edge_norm = jnp.asarray(np.ones((spec.n_edges,), np.float32))
    msgs = B * mpqe_mod.executed_edge_messages(cfg, STRUCTURE)

    def make_loop(encode):
        @jax.jit
        def loop(params, en0, n):
            def body(i, carry):
                en, acc = carry
                q = encode(params, en)
                return en + q[0, :spec.n_edges] * 1e-20, acc + q[0, 0]
            _, acc = jax.lax.fori_loop(0, n, body, (en0, 0.0))
            return acc
        return loop

    log(f"backend={jax.default_backend()} B={B}")
    if not args.skip_base:
        xla_loop = make_loop(lambda p, en: mpqe_mod.encode_dense(
            p, cfg, STRUCTURE, node_entity, node_mode, edge_rel, en))
        log("compiling XLA forward...")
        dt = _timed_loop(xla_loop, params, edge_norm)
        log(f"xla   : {dt*1e3:.3f} ms  {msgs/dt:.3e} msgs/s")

        for blk in [int(b) for b in args.blocks.split(",")]:
            fl = make_loop(
                lambda p, en, blk=blk: mpqe_mod.encode_dense_fused(
                    p, cfg, STRUCTURE, node_entity, node_mode, edge_rel,
                    en, None, blk, False))
            log(f"compiling fused block={blk}...")
            dt = _timed_loop(fl, params, edge_norm)
            log(f"fused {blk}: {dt*1e3:.3f} ms  {msgs/dt:.3e} msgs/s")

    if args.oh_operand:
        # onehot_operand=True: the packed variable one-hot block is
        # built OUTSIDE by XLA and shipped as one bf16 operand the grid
        # pipeline overlaps, instead of iota+compare VPU passes on the
        # kernel's critical path (ops/pallas_fused_fwd.py)
        from mpqe_tpu.ops import pallas_fused_fwd as ff
        for blk in [int(b) for b in args.blocks.split(",")]:
            fl = make_loop(lambda p, en, blk=blk: ff.fused_tgt_forward(
                p, cfg, STRUCTURE, node_entity, node_mode, edge_rel, en,
                block=blk, onehot_operand=True))
            log(f"compiling fused+oh_operand block={blk}...")
            dt = _timed_loop(fl, params, edge_norm)
            log(f"fused+oh {blk}: {dt*1e3:.3f} ms  {msgs/dt:.3e} msgs/s")

    if args.split_gemm:
        # split_gemm=True: the layer-0 operand concat (a [bb, n_ops*d_pad]
        # VPU copy every grid step) is replaced by one GEMM per operand
        # block against the matching W_0 row slice (ops/pallas_fused_fwd)
        from mpqe_tpu.ops import pallas_fused_fwd as ff
        for oh in ([False, True] if args.oh_operand else [False]):
            for blk in [int(b) for b in args.blocks.split(",")]:
                fl = make_loop(
                    lambda p, en, blk=blk, oh=oh: ff.fused_tgt_forward(
                        p, cfg, STRUCTURE, node_entity, node_mode,
                        edge_rel, en, block=blk, onehot_operand=oh,
                        split_gemm=True, vmem_limit_mb=96))
                tag = f"split{'+oh' if oh else ''}"
                log(f"compiling fused+{tag} block={blk}...")
                dt = _timed_loop(fl, params, edge_norm)
                log(f"fused+{tag} {blk}: {dt*1e3:.3f} ms  "
                    f"{msgs/dt:.3e} msgs/s")

    if args.variants:
        from mpqe_tpu.ops import pallas_fused_fwd as ff
        for fold, ob in [(True, False), (False, True), (True, True)]:
            for blk in [int(b) for b in args.blocks.split(",")]:
                fl = make_loop(
                    lambda p, en, blk=blk, fold=fold, ob=ob:
                    ff.fused_tgt_forward(
                        p, cfg, STRUCTURE, node_entity, node_mode,
                        edge_rel, en, block=blk, fold_bias=fold,
                        out_bf16=ob, vmem_limit_mb=args.vmem_mb))
                tag = ("fold" if fold else "") + ("+obf16" if ob else "")
                log(f"compiling fused {tag} block={blk}...")
                try:
                    dt = _timed_loop(fl, params, edge_norm)
                except Exception as e:  # VMEM OOM: record, keep sweeping
                    log(f"fused {tag} {blk}: FAILED {type(e).__name__}: "
                        f"{str(e)[:200]}")
                    continue
                log(f"fused {tag} {blk}: {dt*1e3:.3f} ms  "
                    f"{msgs/dt:.3e} msgs/s")

    if args.train_bwd:
        import optax
        target = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B,)).astype(np.int32))
        negatives = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B, 4)).astype(np.int32))
        neg_mask = jnp.asarray(np.ones((B, 4), np.float32))
        query_mask = jnp.asarray(np.ones((B,), np.float32))
        opt = optax.adam(0.01)

        def make_step_loop(loss_fn):
            opt_state = opt.init(params)

            @jax.jit
            def step_loop(params, opt_state, n):
                def body(i, carry):
                    p, o, _ = carry
                    loss, grads = jax.value_and_grad(
                        lambda pp: loss_fn(pp))(p)
                    up, o = opt.update(grads, o, p)
                    return optax.apply_updates(p, up), o, loss
                _, _, loss = jax.lax.fori_loop(
                    0, n, body, (params, opt_state, jnp.float32(0)))
                return loss
            return step_loop, opt_state

        def run_step(tag, loss_fn):
            loop, opt_state = make_step_loop(loss_fn)
            log(f"compiling train step [{tag}]...")
            dt = _timed_loop(loop, params, opt_state, n_small=5, n_large=55)
            log(f"step {tag}: {dt*1e3:.3f} ms  {B/dt:.3e} queries/s")

        if not args.skip_train_base:
            run_step("dense", lambda p: mpqe_mod.dense_batch_loss(
                p, cfg, STRUCTURE, node_entity, node_mode, edge_rel,
                edge_norm, target, negatives, neg_mask, query_mask))
            run_step("fused_fwd/xla-bwd",
                     lambda p: mpqe_mod.dense_batch_loss_kernel_fused_fwd(
                         p, cfg, STRUCTURE, node_entity, node_mode,
                         edge_rel, edge_norm, target, negatives, neg_mask,
                         query_mask, block=4096, backward="xla",
                         vmem_limit_mb=24))
        for bb in [int(b) for b in args.bwd_blocks.split(",")]:
            run_step(
                f"fused_fwd/pallas-bwd b{bb}",
                lambda p, bb=bb: mpqe_mod.dense_batch_loss_kernel_fused_fwd(
                    p, cfg, STRUCTURE, node_entity, node_mode, edge_rel,
                    edge_norm, target, negatives, neg_mask, query_mask,
                    block=4096, backward="pallas", bwd_block=bb,
                    vmem_limit_mb=24))

    if args.multi:
        from mpqe_tpu.ops import pallas_fused_fwd as ff
        erq = jnp.asarray(
            rng.integers(0, N_RELS, (B, spec.n_edges)).astype(np.int32))
        enq = jnp.asarray(np.ones((B, spec.n_edges), np.float32))

        def make_mloop(encode):
            @jax.jit
            def loop(params, enq0, n):
                def body(i, carry):
                    en, acc = carry
                    q = encode(params, en)
                    return en + q[0:1, 0:spec.n_edges] * 1e-20, acc + q[0, 0]
                _, acc = jax.lax.fori_loop(0, n, body, (enq0, 0.0))
                return acc
            return loop

        log("compiling XLA multi encode...")
        dt = _timed_loop(make_mloop(
            lambda p, en: mpqe_mod.encode_dense_multi(
                p, cfg, STRUCTURE, node_entity, node_mode, erq, en)),
            params, enq)
        log(f"multi xla   : {dt*1e3:.3f} ms  {msgs/dt:.3e} msgs/s")
        for blk in [int(b) for b in args.blocks.split(",")]:
            # the kernel's wide [bb, Bb*d_pad] f32 message operands
            # overflow the 16 MB default scoped-vmem budget at bb>=512
            # (measured: 54.29M at bb=1024) — raise the limit like the
            # backward kernel does
            vl = args.multi_vmem_mb or None
            log(f"compiling fused multi block={blk} vmem={vl}...")
            try:
                dt = _timed_loop(make_mloop(
                    lambda p, en, blk=blk: ff.fused_tgt_forward_multi(
                        p, cfg, STRUCTURE, node_entity, node_mode, erq, en,
                        block=blk, vmem_limit_mb=vl)), params, enq)
            except Exception as e:  # compile OOM: record and keep sweeping
                log(f"multi fused {blk}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")
                continue
            log(f"multi fused {blk}: {dt*1e3:.3f} ms  {msgs/dt:.3e} msgs/s")

    # compiled-mode parity at a small batch (same programs, tiny shapes)
    Bs = 1024
    ne_s, nm_s = node_entity[:Bs], node_mode[:Bs]
    f = jax.jit(lambda p, en: mpqe_mod.encode_dense_fused(
        p, cfg, STRUCTURE, ne_s, nm_s, edge_rel, en, None, 512, False))
    x = jax.jit(lambda p, en: mpqe_mod.encode_dense(
        p, cfg, STRUCTURE, ne_s, nm_s, edge_rel, en))
    got, want = np.asarray(f(params, edge_norm)), np.asarray(x(params, edge_norm))
    rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    log(f"compiled parity (B={Bs}): max rel err {rel:.2e}")


if __name__ == "__main__":
    main()
