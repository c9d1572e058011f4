#!/usr/bin/env python
"""Probe TPU random-row gather cost vs row width and dtype.

loss_breakdown.py measured 11.4 ms to gather 917k random rows of a
[1M, 128] f32 table (~41 GB/s effective vs ~800 peak) — this measures
whether the cost is per-byte (halving row bytes helps -> bf16 table wins)
or per-transaction (row count is all that matters).
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
M = 917_504  # rows gathered (matches the train step)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    for d, dtype in [(128, jnp.float32), (128, jnp.bfloat16),
                     (256, jnp.float32), (32, jnp.float32),
                     (512, jnp.float32)]:
        table = jnp.asarray(
            rng.normal(size=(N, d)).astype(np.float32)).astype(dtype)

        @jax.jit
        def loop(t, idx, n):
            def body(i, carry):
                ix, acc = carry
                g = t[ix]
                s = jnp.sum(g.astype(jnp.float32))
                # perturb indices so the gather cannot be hoisted
                ix = (ix + (s * 1e-30).astype(jnp.int32) + 1) % N
                return ix, acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (idx, 0.0))
            return acc

        name = f"d{d}_{jnp.dtype(dtype).name}"
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        dt = profiling.loop_time(lambda n: loop(table, idx, n))
        gbps = M * d * jnp.dtype(dtype).itemsize / dt / 1e9
        print(json.dumps({"case": name, "ms": dt * 1e3,
                          "eff_gbps": float(gbps)}), flush=True)


if __name__ == "__main__":
    main()
