#!/usr/bin/env python
"""On-chip full-ranking eval throughput: the PRODUCTION full_ranking
device program (`evaluation._rank_counts_impl`: per-query-relation
encode + [B, n_entities] score matmul + same-mode rank count) at the
flagship shape, relay-safe timing (utils/profiling.loop_time).

Only the [B] rank vector leaves the device; the remaining host-side
MRR/Hits arithmetic is numpy on [B] ints and overlaps the next dispatch
in practice, so this is the device bound the eval pipeline runs
against.  Each sweep materializes a [B, n_entities] f32 score matrix on
device (4 GB at B=1024 / 1M entities; B=4096 does NOT fit HBM — which
is why production eval chunks at _effective_max_batch, 256 for this
entity count).

Usage: python tools/eval_bench.py [--batches 1024,4096]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

D = 128
N_ENTITIES = 1_000_000
N_MODES = 4
N_RELS = 266
NUM_BASES = 16
N_LAYERS = 3
STRUCTURE = "3-chain_inter"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.queries import STRUCTURES
    from mpqe_tpu.utils import profiling

    spec = STRUCTURES[STRUCTURE]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=N_ENTITIES, n_modes=N_MODES, n_rels=N_RELS,
        embed_dim=D, n_layers=N_LAYERS, num_bases=NUM_BASES, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    log(f"backend={jax.default_backend()}")

    for B in [int(b) for b in args.batches.split(",")]:
        ne = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B, spec.n_nodes)).astype(np.int32))
        nm = jnp.asarray(
            rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
        er = jnp.asarray(
            rng.integers(0, N_RELS, (B, spec.n_edges)).astype(np.int32))
        en = jnp.asarray(np.ones((B, spec.n_edges), np.float32))

        tgt = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B,)).astype(np.int32))
        emode = jnp.asarray(
            rng.integers(0, N_MODES, (N_ENTITIES,)).astype(np.int32))

        # the PRODUCTION device program (evaluation._rank_counts_impl,
        # exactly what full_ranking dispatches): encode + score sweep +
        # same-mode count above the true answer — only [B] ranks leave
        # the device
        from mpqe_tpu.train import evaluation as ev

        @jax.jit
        def rank_loop(params, en0, n):
            def body(i, carry):
                e, acc = carry
                r = ev._rank_counts_impl(
                    params, cfg, STRUCTURE, ne, nm, er, e, tgt, emode)
                return (e + r[:1].astype(e.dtype) * 1e-20,
                        acc + r[0].astype(jnp.float32))
            _, acc = jax.lax.fori_loop(0, n, body, (en0, 0.0))
            return acc

        log(f"compiling rank sweep (B={B}, {N_ENTITIES} entities)...")
        dt = profiling.loop_time(lambda n: rank_loop(params, en, n),
                                 n_large=55, log=log)
        log(f"B={B}: {dt*1e3:.2f} ms/sweep -> "
            f"{B/dt:.3e} ranked queries/s "
            f"({B*N_ENTITIES/dt:.3e} scored candidates/s)")


if __name__ == "__main__":
    main()
