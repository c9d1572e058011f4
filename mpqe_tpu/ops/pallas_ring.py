"""Pallas RDMA ring halo: the hand-scheduled counterpart of
``parallel.halo.rgcn_ring_halo``.

The XLA ring (ppermute ordered by the compiler's latency-hiding
scheduler) is the default; this kernel is the drop-in refinement for when
real multi-chip profiling shows scheduling gaps (SURVEY.md §7 hard-parts
bullet 4; round-1 VERDICT item 9).  One ``pallas_call`` per device, under
``shard_map``:

  * the local node-feature block circulates the ring via
    ``make_async_remote_copy`` (inter-chip RDMA) between two VMEM slots
    (double buffer);
  * while block ``b`` is in flight to the right neighbor, the kernel
    aggregates the edges whose SOURCE block is the one currently held —
    one-hot MXU gather from the resident slot, in-kernel relation
    coefficient lookup, basis GEMMs, one-hot accumulate into the local
    destination block (same math as ops/pallas_rgcn_blocked);
  * ``rdma.wait()`` lands AFTER the step's aggregation, so transfer and
    compute overlap by construction rather than by scheduler goodwill.

Flow control (ack tokens, round 4): the hop-``s+1`` send overwrites the
right neighbor's slot ``cur`` — the slot it aggregates from at hop ``s``
— and the double buffer alone gives NO ordering between my send and the
neighbor's aggregate: a slow receiver could be overrun.  Each device
therefore posts a token to its LEFT neighbor after finishing
``aggregate(cur)``, and a sender consumes that token before re-sending
into the slot ("your slot is free").  The token is a tiny remote DMA
into a scratch ack buffer whose RECEIVE semaphore is the token count
(the Pallas interpreter implements remote DMAs but not remote
``semaphore_signal``, and on hardware a 512 B RDMA is as cheap as a
remote signal).  Tokens pair 1:1 per hop per slot — a miscount
deadlocks, which the interpret-mode tests would hang on.
Interpret-mode tested on the virtual CPU mesh; compiled multi-chip
validation needs a pod slice.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ring_kernel(
    x_ref,  # [block, d_pad] local node-feature shard
    basis_ref,  # [Bb, d_pad, do_pad]
    coeff_ref,  # [R_pad, Bb]
    src_ref,  # [P*e_max, 1] block-local src per source-block bucket
    dst_ref,  # [P*e_max, 1] block-local dst
    rel_ref,  # [P*e_max, 1]
    norm_ref,  # [P*e_max, 1]
    out_ref,  # [block, do_pad]
    comm_ref,  # scratch [2, block, d_pad]
    send_sem,  # DMA sems [2]
    recv_sem,
    ack_buf,  # scratch [2, 8, 128]: payload for the ack-token DMAs
    ack_send,  # DMA sems [2] (outgoing-token send side)
    ack_recv,  # DMA sems [2]: token count — incremented by the RIGHT
    #            neighbor's ack DMA, decremented by our pre-send wait
    *,
    axis: str,
    n_parts: int,
    e_max: int,
):
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n_parts)
    left = jax.lax.rem(my - 1 + n_parts, n_parts)
    block = x_ref.shape[0]
    r_pad = coeff_ref.shape[0]
    bb = basis_ref.shape[0]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    out_ref[:] = jnp.zeros_like(out_ref)
    comm_ref[0] = x_ref[:]

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (e_max, block), 1)
    rel_iota = jax.lax.broadcasted_iota(jnp.int32, (e_max, r_pad), 1)

    def aggregate(slot, src_blk):
        lo = src_blk * e_max
        s_l = src_ref[pl.ds(lo, e_max), :]
        d_l = dst_ref[pl.ds(lo, e_max), :]
        r = rel_ref[pl.ds(lo, e_max), :]
        w = norm_ref[pl.ds(lo, e_max), :]
        onehot_src = (s_l == node_iota).astype(f32)
        xs = jnp.dot(onehot_src, comm_ref[slot],
                     preferred_element_type=f32, precision=hp)
        coeff_e = jnp.dot((r == rel_iota).astype(f32), coeff_ref[:],
                          preferred_element_type=f32, precision=hp)
        acc = jnp.zeros((e_max, out_ref.shape[1]), f32)
        for b in range(bb):
            h = jnp.dot(xs, basis_ref[b],
                        preferred_element_type=f32, precision=hp)
            acc += coeff_e[:, b:b + 1] * h
        acc = acc * w
        onehot_dst = (d_l == node_iota).astype(f32)
        out_ref[:] += jnp.dot(onehot_dst.T, acc,
                              preferred_element_type=f32, precision=hp)

    def ack_dma(slot, dev):
        return pltpu.make_async_remote_copy(
            src_ref=ack_buf.at[slot],
            dst_ref=ack_buf.at[slot],
            send_sem=ack_send.at[slot],
            recv_sem=ack_recv.at[slot],
            device_id=dev,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # static unroll over ring hops; slot alternation is static too.
    # Ack protocol: the hop-s send targets the right neighbor's slot
    # nxt=(s+1)%2, which that neighbor last reads in aggregate() at hop
    # s-1 — so for s >= 1 the sender first consumes the "slot free"
    # token the neighbor posted after that aggregate.  Hop 0's send
    # into slot 1 needs no token (the slot was never used).  Tokens at
    # hops 0..n_parts-3 pair exactly with waits at hops 1..n_parts-2.
    for s in range(n_parts):
        cur = s % 2
        nxt = (s + 1) % 2
        src_blk = jax.lax.rem(my - s + n_parts, n_parts)
        if s + 1 < n_parts:
            if s > 0:
                # right's slot nxt is free only once it finished its
                # hop-(s-1) aggregate — consume its token (the recv
                # side of the ack DMA the right neighbor posted)
                ack_dma(nxt, right).wait_recv()
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_ref.at[cur],
                dst_ref=comm_ref.at[nxt],
                send_sem=send_sem.at[cur],
                recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            aggregate(cur, src_blk)  # overlaps the in-flight hop
            if s + 1 < n_parts - 1:
                # my slot cur gets overwritten by left's hop-(s+1) send;
                # now that aggregate(cur) is done, hand left the token
                tok = ack_dma(cur, left)
                tok.start()
                tok.wait_send()  # 512 B — negligible stall
            rdma.wait()
        else:
            aggregate(cur, src_blk)


def rgcn_ring_halo_rdma(
    mesh: Mesh,
    params: Dict[str, jax.Array],
    x_padded: jax.Array,  # [n_parts*block, d] sharded (axis, None)
    pe_src_local: jax.Array,  # [P, P, e_max] (dst block, src block, edge)
    pe_dst_local: jax.Array,
    pe_rel: jax.Array,
    pe_norm: jax.Array,
    n_rels: int,
    axis: str = "data",
    interpret: bool = False,
) -> jax.Array:
    """One distributed R-GCN layer with a hand-scheduled Pallas RDMA ring
    (basis models).  Same partition layout as ``halo.rgcn_ring_halo``
    (``halo.partition_edges_ring``); self-loop and bias applied outside
    the kernel.  Prototype: interpret-mode tested; enable on real
    multi-chip hardware only after profiling the XLA ring.  NOTE: pass a
    single-named-axis mesh (the LOGICAL device-id path — and the
    interpreter's RDMA emulation — handle one axis; on a 2-D production
    mesh, build a 1-axis submesh over the data axis for this layer)."""
    if "basis" not in params:
        raise ValueError("rgcn_ring_halo_rdma requires basis decomposition")
    n_parts = mesh.shape[axis]
    n_pad, d = x_padded.shape
    block = n_pad // n_parts
    e_max = int(pe_src_local.shape[-1])
    basis, coeff = params["basis"], params["coeff"]
    bb, _, d_out = basis.shape
    d_pad = _round_up(d, 128)
    do_pad = _round_up(d_out, 128)
    r_pad = _round_up(n_rels + 1, 8)

    basis_p = jnp.zeros((bb, d_pad, do_pad), jnp.float32)
    basis_p = basis_p.at[:, :d, :d_out].set(basis.astype(jnp.float32))
    coeff_p = jnp.zeros((r_pad, bb), jnp.float32)
    coeff_p = coeff_p.at[:n_rels].set(coeff.astype(jnp.float32))

    kernel = functools.partial(
        _ring_kernel, axis=axis, n_parts=n_parts, e_max=e_max)

    def local_fn(x_l, src_l, dst_l, rel_l, norm_l):
        x_p = jnp.zeros((block, d_pad), jnp.float32)
        x_p = x_p.at[:, :d].set(x_l.astype(jnp.float32))
        # [1, P, e_max] shard -> flat [P*e_max, 1] buckets
        def flat(a):
            return a.reshape(-1, 1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, do_pad), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, 8, 128), jnp.float32),  # ack payload
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7),
        )(
            x_p, basis_p, coeff_p,
            flat(src_l).astype(jnp.int32),
            flat(dst_l).astype(jnp.int32),
            flat(rel_l).astype(jnp.int32),
            flat(norm_l).astype(jnp.float32),
        )
        agg = out[:, :d_out]
        return (
            jnp.dot(x_l, params["w_self"], preferred_element_type=jnp.float32)
            + agg
            + params["bias"]
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(x_padded, pe_src_local, pe_dst_local, pe_rel, pe_norm)
