#!/usr/bin/env python
"""Measure embedding-gradient scatter strategies on the real chip.

The round-1 train step spends ~15 of 47 ms in the entity-table gradient
scatter (docs/roadmap.md).  This experiment times the backward of a
gather-heavy toy loss under the candidate fixes, to pick the design for
the production train step:

  multi     — separate gathers per consumer (anchors/target/negs), the
              round-1 formulation: XLA materializes several full-table
              scatter results and adds them.
  fused     — one concatenated-index gather -> one backward scatter.
  sorted    — fused + custom VJP: argsort indices, scatter rows in sorted
              order (indices_are_sorted hint).
  dedup     — sorted + segment-sum duplicate rows first, scatter unique
              rows only (the VERDICT round-1 suggestion).

Prints one JSON line per variant (relay-safe fori_loop timing).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.utils import profiling

N = 1_000_000
D = 128
B = 131_072
COLS = 7  # 2 anchors + 1 target + 4 negatives


def scatter_plain(n, idx, g):
    return jnp.zeros((n, g.shape[-1]), g.dtype).at[idx].add(g)


def scatter_sorted(n, idx, g):
    order = jnp.argsort(idx)
    return jnp.zeros((n, g.shape[-1]), g.dtype).at[idx[order]].add(
        g[order], indices_are_sorted=True
    )


def scatter_dedup(n, idx, g):
    m, d = g.shape
    order = jnp.argsort(idx)
    idx_s = idx[order]
    g_s = g[order]
    head = jnp.concatenate(
        [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]])
    seg = jnp.cumsum(head) - 1  # [m] in [0, n_unique)
    sums = jax.ops.segment_sum(g_s, seg, num_segments=m)
    rep = jax.ops.segment_min(idx_s, seg, num_segments=m)  # unique ids
    rep = jnp.clip(rep, 0, n)  # empty segments -> int-max -> drop row n
    out = jnp.zeros((n + 1, d), g.dtype).at[rep].add(
        sums, indices_are_sorted=True
    )
    return out[:n]


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, COLS)).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(B, COLS, D)).astype(np.float32))

    def make_loss(mode):
        # idx/c arrive as arguments (NOT closures: closure constants are
        # embedded in the HLO and overflow the relay's compile request)
        if mode == "multi":
            def loss(t, idx, c):
                acc = 0.0
                for j in range(COLS):
                    acc = acc + jnp.vdot(jnp.square(t[idx[:, j]]), c[:, j])
                return acc
            return loss
        if mode == "fused":
            def loss(t, idx, c):
                return jnp.vdot(jnp.square(t[idx.reshape(-1)]), c.reshape(-1, D))
            return loss

        def make_custom(scatter_fn):
            @jax.custom_vjp
            def lookup(t, i):
                return t[i]

            def fwd(t, i):
                return t[i], i

            def bwd(i, g):
                return scatter_fn(N, i, g), None

            lookup.defvjp(fwd, bwd)
            return lookup

        lk = make_custom(
            scatter_sorted if mode == "sorted" else scatter_dedup)

        def loss(t, idx, c):
            return jnp.vdot(jnp.square(lk(t, idx.reshape(-1))), c.reshape(-1, D))
        return loss

    for mode in ["multi", "fused", "sorted", "dedup"]:
        loss = make_loss(mode)

        @jax.jit
        def grad_loop(t, idx, c, n):
            def body(i, carry):
                tt, acc = carry
                g = jax.grad(loss)(tt, idx, c)
                return tt + g * 1e-30, acc + g[0, 0]
            _, acc = jax.lax.fori_loop(0, n, body, (t, 0.0))
            return acc

        dt = profiling.loop_time(lambda n: grad_loop(table, idx, c, n))
        print(json.dumps({"variant": mode, "ms": dt * 1e3}), flush=True)


if __name__ == "__main__":
    main()
