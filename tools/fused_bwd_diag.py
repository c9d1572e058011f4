#!/usr/bin/env python
"""Compiled-mode diagnosis of the fused Pallas backward mismatch seen in
tpu_smoke (params 0.257 normalized vs the 3e-2 bar).  Compares per-leaf
against the XLA VJP, in both bf16-wire and f32-wire modes — if f32-wire
matches, the reverse sweep lowers correctly and the gap is operand
rounding; if it mismatches too, a Mosaic lowering bug (accumulators /
transposed dot_general) is in play.

Run on the real chip: python tools/fused_bwd_diag.py [--bwd_block 512]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpqe_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpqe_tpu.models import mpqe as mpqe_mod  # noqa: E402
from mpqe_tpu.ops import pallas_fused_fwd as ff  # noqa: E402
from mpqe_tpu.queries import STRUCTURES  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def walk(a, b, path=""):
    rows = []
    if isinstance(a, dict):
        for k in sorted(a):
            rows += walk(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        for i, (x, y) in enumerate(zip(a, b)):
            rows += walk(x, y, f"{path}[{i}]")
    else:
        x = np.asarray(a, np.float32)
        y = np.asarray(b, np.float32)
        if x.size == 0:
            return rows
        s = np.max(np.abs(y)) + 1e-9
        mx = float(np.max(np.abs(x - y)) / s)
        mean = float(np.mean(np.abs(x - y)) / (np.mean(np.abs(y)) + 1e-9))
        rows.append((path, mx, mean))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd_block", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--structure", default="3-chain_inter")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    spec = STRUCTURES[args.structure]
    cfg = mpqe_mod.MPQEConfig(
        n_entities=2000, n_modes=4, n_rels=12, embed_dim=128,
        n_layers=3, num_bases=8, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(7), cfg)
    B = args.batch
    ne = jnp.asarray(rng.integers(0, 2000, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, 4, (B, spec.n_nodes)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, 12, (spec.n_edges,)).astype(np.int32))
    en = jnp.asarray(rng.uniform(0.5, 1.5, (spec.n_edges,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))

    log("compiling xla vjp (oracle)...")

    @jax.jit
    def xla_vjp(p, e):
        _, vjp = jax.vjp(lambda pp, ee: mpqe_mod.encode_dense(
            pp, cfg, args.structure, ne, nm, er, ee), p, e)
        return vjp(g)

    dp_x, den_x = jax.device_get(xla_vjp(params, en))

    log("compiling xla vjp at HIGHEST (oracle self-envelope)...")

    @jax.jit
    def xla_vjp_hi(p, e):
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(lambda pp, ee: mpqe_mod.encode_dense(
                pp, cfg, args.structure, ne, nm, er, ee), p, e)
            return vjp(g)

    dp_h, den_h = jax.device_get(xla_vjp_hi(params, en))
    print("--- oracle self-envelope (HIGHEST vs default)")
    for path, mx, mean in walk(dp_h, dp_x) + walk(den_h, den_x,
                                                  "edge_norm"):
        print(f"  {path}: max {mx:.4e}  mean {mean:.4e}", flush=True)

    for f32w in (False, True):
        log(f"compiling pallas backward f32_wire={f32w}...")

        @jax.jit
        def pb(p, e):
            return ff.fused_tgt_backward(
                p, cfg, args.structure, ne, nm, er, e, None, g,
                block=args.bwd_block, f32_wire=f32w)

        dp_p, den_p, _ = jax.device_get(pb(params, en))
        rows = walk(dp_p, dp_x) + walk(den_p, den_x, "edge_norm")
        print(f"--- f32_wire={f32w} bwd_block={args.bwd_block}")
        for path, mx, mean in rows:
            flag = " <-- BAD(mean)" if mean > 3e-2 else ""
            print(f"  {path}: max {mx:.4e}  mean {mean:.4e}{flag}",
                  flush=True)


if __name__ == "__main__":
    main()
