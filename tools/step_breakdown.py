#!/usr/bin/env python
"""Decompose the train-step time on the real chip: forward, loss+grad,
optimizer update, and embedding-gradient scatter — to target optimization
work.  Prints one JSON line per phase (relay-safe timing)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpqe_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()  # honor JAX_PLATFORMS=cpu in-process (CLAUDE.md)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import STRUCTURES
from mpqe_tpu.utils import profiling

D = 128
N_ENTITIES = 1_000_000
N_RELS = 266
STRUCTURE = "3-chain_inter"
B = 131_072
N_NEG = 4


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="dense",
                    choices=["dense", "fused_fwd"],
                    help="loss path to decompose: dense XLA (rounds 2-3 "
                         "baseline) or the fused Pallas forward + Pallas "
                         "backward (the round-4 39.6 ms step)")
    ap.add_argument("--adam_probe", action="store_true",
                    help="time the entity-table Adam update dense "
                         "(full-table streams) vs touched-row "
                         "(gather/update/scatter of ~unique touched "
                         "rows) — decides VERDICT r4 item 5's "
                         "touched-row lever with a measurement")
    args = ap.parse_args()
    spec = STRUCTURES[STRUCTURE]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=N_ENTITIES, n_modes=4, n_rels=N_RELS, embed_dim=D,
        n_layers=3, num_bases=16, readout="tgt",
    )
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ne = jnp.asarray(rng.integers(0, N_ENTITIES, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, 4, (B, spec.n_nodes)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, N_RELS, (spec.n_edges,)).astype(np.int32))
    en = jnp.asarray(np.ones((spec.n_edges,), np.float32))
    tgt = jnp.asarray(rng.integers(0, N_ENTITIES, (B,)).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, N_ENTITIES, (B, N_NEG)).astype(np.int32))
    nmask = jnp.asarray(np.ones((B, N_NEG), np.float32))
    qmask = jnp.asarray(np.ones((B,), np.float32))

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    if args.kernel == "fused_fwd":
        def loss_of(p):
            return mpqe_mod.dense_batch_loss_kernel_fused_fwd(
                p, cfg, STRUCTURE, ne, nm, er, en, tgt, neg, nmask,
                qmask, block=4096, backward="pallas", bwd_block=1024,
                vmem_limit_mb=24)
    else:
        def loss_of(p):
            return mpqe_mod.dense_batch_loss(
                p, cfg, STRUCTURE, ne, nm, er, en, tgt, neg, nmask, qmask)

    grads_once = jax.jit(lambda p: jax.grad(loss_of)(p))(params)

    def report(name, dt):
        print(json.dumps({"phase": name, "ms": dt * 1e3}), flush=True)

    # 1) forward (loss only) — thread a perturbation through iterations so
    # XLA cannot hoist the loop-invariant loss out of the loop
    @jax.jit
    def fwd_loop(p, n):
        def body(i, carry):
            pp, acc = carry
            l = loss_of(pp)
            pp = jax.tree_util.tree_map(
                lambda a: a + (l * 1e-20).astype(a.dtype), pp)
            return pp, acc + l
        _, acc = jax.lax.fori_loop(0, n, body, (p, 0.0))
        return acc
    report("forward_loss", profiling.loop_time(lambda n: fwd_loop(params, n)))

    # 2) loss + grad
    @jax.jit
    def grad_loop(p, n):
        def body(i, carry):
            acc, pp = carry
            l, g = jax.value_and_grad(loss_of)(pp)
            return acc + l * 1e-9, jax.tree_util.tree_map(
                lambda a, b: a + b * 1e-20, pp, g)
        acc, _ = jax.lax.fori_loop(0, n, body, (0.0, p))
        return acc
    report("loss_plus_grad", profiling.loop_time(lambda n: grad_loop(params, n)))

    # 3) optimizer update only (fixed grads)
    @jax.jit
    def opt_loop(p, o, g, n):
        def body(i, carry):
            pp, oo = carry
            up, oo = opt.update(g, oo, pp)
            return optax.apply_updates(pp, up), oo
        pp, _ = jax.lax.fori_loop(0, n, body, (p, o))
        return pp["emb"]["ent"][0, 0]
    report("adam_update", profiling.loop_time(
        lambda n: opt_loop(params, opt_state, grads_once, n)))

    # 4) full step
    @jax.jit
    def step_loop(p, o, n):
        def body(i, carry):
            pp, oo, _ = carry
            l, g = jax.value_and_grad(loss_of)(pp)
            up, oo = opt.update(g, oo, pp)
            return optax.apply_updates(pp, up), oo, l
        _, _, l = jax.lax.fori_loop(0, n, body, (p, o, jnp.float32(0)))
        return l
    report("full_step", profiling.loop_time(
        lambda n: step_loop(params, opt_state, n)))

    # 5) entity-table Adam traffic probe (round 5, VERDICT r4 item 5):
    # dense full-table moment streams vs touched-row gather/update/
    # scatter.  Arithmetic from the measured numbers says touched-row
    # loses badly at this shape (random-row table traffic runs at
    # ~40-50 GB/s effective vs ~800 GB/s sequential; the batch touches
    # ~60% of the 1M-row table), but the claim deserves a measurement.
    if args.adam_probe:
        ent = params["emb"]["ent"]
        g_ent = grads_once["emb"]["ent"]
        m0 = jnp.zeros_like(ent)
        v0 = jnp.zeros_like(ent)

        @jax.jit
        def dense_adam_loop(p_, m, v, g, n):
            def body(i, carry):
                p_, m, v = carry
                m = 0.9 * m + 0.1 * g
                v = 0.999 * v + 0.001 * (g * g)
                p_ = p_ - 0.01 * m / (jnp.sqrt(v) + 1e-8)
                return p_, m, v
            p_, m, v = jax.lax.fori_loop(0, n, body, (p_, m, v))
            return p_[0, 0] + m[0, 0] + v[0, 0]

        report("adam_dense_ent_table", profiling.loop_time(
            lambda n: dense_adam_loop(ent, m0, v0, g_ent, n)))

        # unique touched rows at the flagship batch: B*(2 anchors +
        # tgt + 4 negs) = 917504 draws of 1M -> ~600k distinct
        R = 655_360
        idx = jnp.asarray(rng.choice(
            N_ENTITIES, size=R, replace=False).astype(np.int32))

        @jax.jit
        def touched_adam_loop(p_, m, v, gr, n):
            def body(i, carry):
                p_, m, v = carry
                mr = 0.9 * m[idx] + 0.1 * gr
                vr = 0.999 * v[idx] + 0.001 * (gr * gr)
                pr = p_[idx] - 0.01 * mr / (jnp.sqrt(vr) + 1e-8)
                return (p_.at[idx].set(pr), m.at[idx].set(mr),
                        v.at[idx].set(vr))
            p_, m, v = jax.lax.fori_loop(0, n, body, (p_, m, v))
            return p_[0, 0] + m[0, 0] + v[0, 0]

        gr = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
        report("adam_touched_rows_655k", profiling.loop_time(
            lambda n: touched_adam_loop(ent, m0, v0, gr, n)))


if __name__ == "__main__":
    main()
