#!/usr/bin/env python
"""Compose the two measured train-step levers on one step: --dtype
bfloat16 (bf16 params + activations + Adam state; 36.9 ms alone) and
--shared_negatives (batch-shared candidate set; 28.9 ms alone), at the
flagship shape.  Both levers cut the same bottleneck — random-row
entity-table HBM transactions (BASELINE.md round-2 trace attribution)
— bf16 by halving row bytes (which the gather probe says does NOT help:
transaction-bound) and Adam bytes (which DOES), shared-negs by gathering
and scattering ~2x fewer rows.  This tool answers whether they stack.

Prints one JSON line per (dtype, protocol) combo; run on the real chip.
Usage: python tools/bf16_shared_bench.py [--combos f32,bf16,f32_shared,bf16_shared]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpqe_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mpqe_tpu.models import mpqe as mpqe_mod  # noqa: E402
from mpqe_tpu.queries import STRUCTURES  # noqa: E402
from mpqe_tpu.utils import profiling  # noqa: E402

D = 128
N_ENTITIES = 1_000_000
N_MODES = 4
N_RELS = 266
NUM_BASES = 16
N_LAYERS = 3
STRUCTURE = "3-chain_inter"
B = 131_072
N_NEG = 4
K_SHARED = 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(dtype: str, shared: bool, fused: str = "") -> dict:
    """fused: '' = dense encoder; 'xla'/'pallas' = fused_fwd kernel with
    that backward (block 4096, bwd_block 1024 — the measured-best fwd
    config, BASELINE.md)."""
    spec = STRUCTURES[STRUCTURE]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=N_ENTITIES, n_modes=N_MODES, n_rels=N_RELS,
        embed_dim=D, n_layers=N_LAYERS, num_bases=NUM_BASES, readout="tgt",
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ne = jnp.asarray(rng.integers(0, N_ENTITIES, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, N_RELS, (spec.n_edges,)).astype(np.int32))
    en = jnp.asarray(np.ones((spec.n_edges,), np.float32))
    tgt = jnp.asarray(rng.integers(0, N_ENTITIES, (B,)).astype(np.int32))
    qmask = jnp.asarray(np.ones((B,), np.float32))
    if shared:
        sneg = jnp.asarray(
            rng.integers(0, N_ENTITIES, (K_SHARED,)).astype(np.int32))

        def loss_fn(p):
            return mpqe_mod.dense_batch_loss_shared_negs(
                p, cfg, STRUCTURE, ne, nm, er, en, tgt, sneg, qmask,
                encoder="fused_fwd" if fused else "dense",
                fused_block=4096, fused_backward=fused or "xla",
                fused_bwd_block=1024, fused_vmem_limit_mb=24)
    elif fused:
        neg = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B, N_NEG)).astype(np.int32))
        nmask = jnp.asarray(np.ones((B, N_NEG), np.float32))

        def loss_fn(p):
            return mpqe_mod.dense_batch_loss_kernel_fused_fwd(
                p, cfg, STRUCTURE, ne, nm, er, en, tgt, neg, nmask, qmask,
                block=4096, backward=fused, bwd_block=1024,
                vmem_limit_mb=24)
    else:
        neg = jnp.asarray(
            rng.integers(0, N_ENTITIES, (B, N_NEG)).astype(np.int32))
        nmask = jnp.asarray(np.ones((B, N_NEG), np.float32))

        def loss_fn(p):
            return mpqe_mod.dense_batch_loss(
                p, cfg, STRUCTURE, ne, nm, er, en, tgt, neg, nmask, qmask)

    opt = optax.adam(0.01)
    opt_state = opt.init(params)  # state dtype mirrors the param dtype

    @jax.jit
    def step_loop(params, opt_state, n):
        def body(i, carry):
            p, o, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0)))
        return loss

    name = f"{dtype}{'_shared' if shared else ''}" + (
        f"_fused[{fused}]" if fused else "")
    log(f"[{name}] compiling train step...")
    dt = profiling.loop_time(lambda n: step_loop(params, opt_state, n),
                             log=log)
    row = {
        "combo": name, "dtype": dtype,
        "protocol": ("shared_negatives_variant" if shared
                     else "per_query_negatives"),
        "encoder": f"fused_fwd/{fused}" if fused else "dense",
        "n_negatives": K_SHARED if shared else N_NEG,
        "train_step_ms": dt * 1e3,
        "train_queries_per_s": B / dt,
    }
    print(json.dumps(row), flush=True)
    return row


# combo name -> (dtype, shared, fused_backward)
KNOWN_COMBOS = {
    "f32": ("float32", False, ""),
    "bf16": ("bfloat16", False, ""),
    "f32_shared": ("float32", True, ""),
    "bf16_shared": ("bfloat16", True, ""),
    "f32_fused": ("float32", False, "pallas"),
    "bf16_fused": ("bfloat16", False, "pallas"),
    "f32_shared_fused": ("float32", True, "pallas"),
    "bf16_shared_fused": ("bfloat16", True, "pallas"),
    "f32_fused_xlabwd": ("float32", False, "xla"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", default="f32,bf16,f32_shared,bf16_shared")
    args = ap.parse_args(argv)
    combos = [c.strip() for c in args.combos.split(",") if c.strip()]
    bad = [c for c in combos if c not in KNOWN_COMBOS]
    if bad:
        ap.error(f"unknown combo(s) {bad}; known: {list(KNOWN_COMBOS)}")
    log(f"backend={jax.default_backend()} B={B}")
    for c in combos:
        dtype, shared, fused = KNOWN_COMBOS[c]
        measure(dtype, shared, fused)


if __name__ == "__main__":
    main()
