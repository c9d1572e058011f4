"""Pallas RDMA ring halo prototype (ops/pallas_ring.py) vs the XLA
ppermute ring and the single-device sparse path — interpreter mode on the
virtual CPU mesh (the Pallas interpreter emulates inter-device RDMA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import pallas_ring
from mpqe_tpu.ops import rgcn as rgcn_ops
from mpqe_tpu.ops.edge_store import build_edge_store
from mpqe_tpu.parallel import halo

D = 16
N_RELS = 6


@pytest.fixture(scope="module")
def mesh4():
    # single named axis: the pallas interpreter's RDMA discharge supports
    # LOGICAL device ids only on 1-axis meshes
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:4]), ("data",))


def _graph(rng, n_nodes=48, n_e=200):
    src = rng.integers(0, n_nodes, n_e).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_e).astype(np.int32)
    rel = rng.integers(0, N_RELS, n_e).astype(np.int32)
    return build_edge_store(src, dst, rel, n_nodes, N_RELS)


def test_rdma_ring_matches_single_device(mesh4, rng):
    st = _graph(rng)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(0), D, D, N_RELS, 3)
    x = rng.normal(size=(st.n_nodes, D)).astype(np.float32)

    want = np.asarray(
        rgcn_ops.rgcn_sparse(
            jnp.asarray(x), p, st.src, st.dst, st.rel,
            jnp.asarray(st.norm), N_RELS,
        )
    )

    pr = halo.partition_edges_ring(st, n_parts=4)
    x_pad = np.zeros((pr.n_nodes_padded, D), np.float32)
    x_pad[: st.n_nodes] = x
    got = np.asarray(
        pallas_ring.rgcn_ring_halo_rdma(
            mesh4, p, jnp.asarray(x_pad),
            jnp.asarray(pr.src_local), jnp.asarray(pr.dst_local),
            jnp.asarray(pr.rel), jnp.asarray(pr.norm), N_RELS,
            interpret=True,
        )
    )[: st.n_nodes]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rdma_ring_matches_xla_ring(mesh4, rng):
    st = _graph(rng, n_nodes=32, n_e=120)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(1), D, D, N_RELS, 2)
    pr = halo.partition_edges_ring(st, n_parts=4)
    x_pad = rng.normal(size=(pr.n_nodes_padded, D)).astype(np.float32)

    args = (jnp.asarray(pr.src_local), jnp.asarray(pr.dst_local),
            jnp.asarray(pr.rel), jnp.asarray(pr.norm), N_RELS)
    want = np.asarray(halo.rgcn_ring_halo(
        mesh4, p, jnp.asarray(x_pad), *args))
    got = np.asarray(pallas_ring.rgcn_ring_halo_rdma(
        mesh4, p, jnp.asarray(x_pad), *args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rdma_ring_requires_basis(mesh4, rng):
    st = _graph(rng, n_nodes=16, n_e=40)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(2), D, D, N_RELS, None)
    pr = halo.partition_edges_ring(st, n_parts=4)
    x_pad = np.zeros((pr.n_nodes_padded, D), np.float32)
    with pytest.raises(ValueError):
        pallas_ring.rgcn_ring_halo_rdma(
            mesh4, p, jnp.asarray(x_pad),
            jnp.asarray(pr.src_local), jnp.asarray(pr.dst_local),
            jnp.asarray(pr.rel), jnp.asarray(pr.norm), N_RELS,
            interpret=True,
        )


@pytest.mark.parametrize("n_parts", [2, 8])
def test_rdma_ring_ack_tokens_all_ring_sizes(rng, n_parts):
    # the ack-token protocol's signal/wait pairing depends on ring size
    # (tokens at hops 0..P-3 pair with waits at hops 1..P-2; P=2 has
    # neither) — a miscount deadlocks (the test would hang) and a
    # wrong-slot token corrupts the result (parity would fail)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:n_parts]), ("data",))
    st = _graph(rng, n_nodes=16 * n_parts, n_e=60 * n_parts)
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(3), D, D, N_RELS, 3)
    x = rng.normal(size=(st.n_nodes, D)).astype(np.float32)
    want = np.asarray(rgcn_ops.rgcn_sparse(
        jnp.asarray(x), p, st.src, st.dst, st.rel,
        jnp.asarray(st.norm), N_RELS))
    pr = halo.partition_edges_ring(st, n_parts=n_parts)
    x_pad = np.zeros((pr.n_nodes_padded, D), np.float32)
    x_pad[: st.n_nodes] = x
    got = np.asarray(pallas_ring.rgcn_ring_halo_rdma(
        mesh, p, jnp.asarray(x_pad),
        jnp.asarray(pr.src_local), jnp.asarray(pr.dst_local),
        jnp.asarray(pr.rel), jnp.asarray(pr.norm), N_RELS,
        interpret=True))[: st.n_nodes]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
