#!/usr/bin/env python
"""Achievable-GEMM-floor attribution for the fused whole-forward kernel
(VERDICT r4 item 3 / r3 item 5): the kernel's per-block compute is
exactly ``relu(X@W0+b0) @ W1 + b1`` at [B,384]x[384,256] and
[B,256]x[256,128] (all edge/self/norm work pre-assembled into W by
``_layer_matrices``; ops/pallas_fused_fwd.py).  The peak-MXU roofline
(0.174 ms at B=131072) assumes those GEMMs run at bf16 peak — this tool
measures what XLA itself achieves for the same math on the same chip:

  * gemm_chain      — the two GEMMs + bias + relu, bf16 operands
  * gemm_only       — the two GEMMs alone (no bias/relu)
  * onehot_build    — packed variable one-hot construction from mode ids
                      (iota-compare), the kernel's main VPU side work

If gemm_chain lands near the kernel's 0.29 ms, the remaining roofline
gap is *small-K GEMM efficiency at these tile shapes* (384/256 reduction
dims), not kernel overhead — i.e. the honest bound for this program is
the measured XLA GEMM floor, and the 0.174 ms peak-MXU number is not
achievable by any implementation of this math on this chip.

Reference: no analog (the reference's forward is PyG RGCNConv
scatter/gather; SURVEY.md L3).  Mount empty — spec-built.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpqe_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.utils import profiling

B = 131_072


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, 384)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(size=(384, 256)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    b0 = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    modes = jnp.asarray(rng.integers(0, 4, size=(B, 2)).astype(np.int32))

    def timed(name, loop):
        dt = profiling.loop_time(loop, log=log)
        log(f"{name}: {dt*1e3:.3f} ms")
        return dt

    @jax.jit
    def chain_loop(x0, w0, w1, n):
        def body(i, carry):
            x, acc = carry
            y = jnp.dot(x, w0, preferred_element_type=jnp.float32) + b0
            y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
            z = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
            zb = z.astype(jnp.bfloat16)
            return x + zb[:, 0:1] * jnp.bfloat16(1e-8), acc + z[0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (x0, 0.0))
        return acc

    @jax.jit
    def gemm_loop(x0, w0, w1, n):
        def body(i, carry):
            x, acc = carry
            y = jnp.dot(x, w0, preferred_element_type=jnp.float32)
            z = jnp.dot(y.astype(jnp.bfloat16), w1,
                        preferred_element_type=jnp.float32)
            return (x + z.astype(jnp.bfloat16)[:, 0:1] * jnp.bfloat16(1e-8),
                    acc + z[0, 0])
        _, acc = jax.lax.fori_loop(0, n, body, (x0, 0.0))
        return acc

    @jax.jit
    def onehot_loop(m0, n):
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

        def body(i, carry):
            m, acc = carry
            oh = jnp.logical_or(m[:, 0:1] == iota,
                                m[:, 1:2] + 8 == iota).astype(jnp.bfloat16)
            return m + (oh[:, 0:1].astype(jnp.int32) * 0), acc + oh[0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (m0, jnp.bfloat16(0)))
        return acc

    log("compiling gemm_chain...")
    dt_chain = timed("gemm_chain [B,384]@[384,256]+b,relu -> @[256,128]+b",
                     lambda n: chain_loop(x0, w0, w1, n))
    log("compiling gemm_only...")
    dt_gemm = timed("gemm_only", lambda n: gemm_loop(x0, w0, w1, n))
    log("compiling onehot_build...")
    dt_oh = timed("onehot_build [B,128] from 2 mode cols",
                  lambda n: onehot_loop(modes, n))
    flops = 2 * B * (384 * 256 + 256 * 128)
    log(f"peak-MXU model: {flops/197e12*1e3:.3f} ms; "
        f"gemm_only achieves {flops/dt_gemm/1e12:.1f} TFLOP/s "
        f"({flops/dt_gemm/197e12*100:.0f}% of bf16 peak)")


if __name__ == "__main__":
    main()
