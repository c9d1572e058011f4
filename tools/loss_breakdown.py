#!/usr/bin/env python
"""Dissect the train step's forward-loss time on the real chip.

step_breakdown.py showed forward_loss ~= 20 ms while the encode alone is
~1 ms — this isolates the loss-side pieces to find where the time goes:

  encode        query vectors only
  gather        the fused entity-row gather only (anchors+target+negs)
  enc_gather    encode + gather (no scoring)
  pos_score     encode + positive cosine scores
  full_loss     the production dense_batch_loss

One JSON line per phase (relay-safe timing).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.ops import embed as embed_ops
from mpqe_tpu.queries import STRUCTURES
from mpqe_tpu.utils import profiling

D = 128
N_ENTITIES = 1_000_000
N_RELS = 266
STRUCTURE = "3-chain_inter"
B = 131_072
N_NEG = 4


def main():
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
    a_slots = list(mpqe_mod.anchor_gather_slots(cfg, STRUCTURE))
    idx_all = jnp.concatenate([ne[:, a_slots], tgt[:, None], neg], axis=1)

    def report(name, fn):
        @jax.jit
        def loop(p, n):
            def body(i, carry):
                pp, acc = carry
                out = fn(pp)
                pp = jax.tree_util.tree_map(
                    lambda a: a + (out * 1e-30).astype(a.dtype), pp)
                return pp, acc + out
            _, acc = jax.lax.fori_loop(0, n, body, (p, 0.0))
            return acc

        print(f"compiling {name}...", file=sys.stderr, flush=True)
        dt = profiling.loop_time(lambda n: loop(params, n))
        print(json.dumps({"phase": name, "ms": dt * 1e3}), flush=True)

    report("encode", lambda p: jnp.sum(
        mpqe_mod.encode_dense(p, cfg, STRUCTURE, ne, nm, er, en)) * 1e-9)
    report("gather", lambda p: jnp.sum(
        embed_ops.embedding_lookup(p["emb"]["ent"], idx_all)) * 1e-9)
    report("enc_gather", lambda p: (
        jnp.sum(mpqe_mod.encode_dense(p, cfg, STRUCTURE, ne, nm, er, en))
        + jnp.sum(embed_ops.embedding_lookup(p["emb"]["ent"], idx_all))
    ) * 1e-9)
    report("pos_score", lambda p: jnp.sum(mpqe_mod.score(
        cfg,
        mpqe_mod.encode_dense(p, cfg, STRUCTURE, ne, nm, er, en),
        p["emb"]["ent"][tgt])) * 1e-9)
    report("full_loss", lambda p: mpqe_mod.dense_batch_loss(
        p, cfg, STRUCTURE, ne, nm, er, en, tgt, neg, nmask, qmask))


if __name__ == "__main__":
    main()
