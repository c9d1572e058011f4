"""End-to-end kernel train path: dense_batch_loss_kernel_{fused,blocked}
must match dense_batch_loss (VERDICT r2 item 2 — the Pallas kernels become
load-bearing via --kernel, with the sparse layout built on-device).
Interpret mode (CPU); compiled-mode parity lives in tools/tpu_smoke.py.
"""

import functools

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.data.batcher import make_dense_batch
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.ops import template_layout
from mpqe_tpu.queries import STRUCTURE_NAMES, STRUCTURES, group_queries_by_formula

D = 32
B = 16


@pytest.fixture(scope="module")
def setup():
    kg = make_random_kg(n_entities=60, n_modes=3, n_base_rels=4,
                        n_triples=500, seed=0)
    sampler = QuerySampler(kg, seed=0)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=D, n_layers=3, num_bases=4, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    return kg, sampler, cfg, params


def _batch(sampler, structure, rng):
    qs = sampler.sample_queries(structure, B, n_neg=4)
    by_f = group_queries_by_formula(qs)[structure]
    formula = next(iter(by_f))
    return make_dense_batch(formula, by_f[formula], batch_size=B,
                            n_neg=2, rng=rng)


def _args(b):
    return (jnp.asarray(b.node_entity), jnp.asarray(b.node_mode),
            jnp.asarray(b.edge_rel), jnp.asarray(b.edge_norm),
            jnp.asarray(b.target), jnp.asarray(b.negatives),
            jnp.asarray(b.neg_mask), jnp.asarray(b.query_mask))


@pytest.mark.parametrize("structure", STRUCTURE_NAMES)
def test_fused_kernel_loss_matches_dense(setup, structure):
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(1)
    b = _batch(sampler, structure, rng)
    want = float(mpqe_mod.dense_batch_loss(params, cfg, structure, *_args(b)))
    got = float(mpqe_mod.dense_batch_loss_kernel_fused(
        params, cfg, structure, *_args(b), chunk=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("structure", ["1-chain", "2-inter", "3-chain_inter"])
def test_blocked_kernel_loss_matches_dense(setup, structure):
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(2)
    b = _batch(sampler, structure, rng)
    want = float(mpqe_mod.dense_batch_loss(params, cfg, structure, *_args(b)))
    got = float(mpqe_mod.dense_batch_loss_kernel_blocked(
        params, cfg, structure, *_args(b),
        queries_per_block=8, chunk=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("structure", ["1-chain", "2-inter", "3-chain_inter"])
def test_fused_fwd_kernel_loss_matches_dense(setup, structure):
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(7)
    b = _batch(sampler, structure, rng)
    want = float(mpqe_mod.dense_batch_loss(params, cfg, structure, *_args(b)))
    got = float(mpqe_mod.dense_batch_loss_kernel_fused_fwd(
        params, cfg, structure, *_args(b), block=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_fwd_kernel_grads_match_dense(setup):
    # backward recomputes through the XLA path: primal-dependent factors
    # (margin hinge actives) may differ at the bf16 edge, but with the
    # same actives the gradients agree to the dense path's own precision
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(8)
    b = _batch(sampler, "3-chain_inter", rng)
    args = _args(b)
    g_dense = jax.grad(mpqe_mod.dense_batch_loss)(
        params, cfg, "3-chain_inter", *args)
    g_ff = jax.grad(functools.partial(
        mpqe_mod.dense_batch_loss_kernel_fused_fwd,
        block=8, interpret=True))(params, cfg, "3-chain_inter", *args)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_ff)
    s = float(jnp.abs(flat_d).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_f) / s, np.asarray(flat_d) / s,
                               rtol=2e-2, atol=2e-2)


def test_fused_kernel_grads_match_dense(setup):
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(3)
    b = _batch(sampler, "3-chain_inter", rng)
    args = _args(b)
    g_dense = jax.grad(mpqe_mod.dense_batch_loss)(
        params, cfg, "3-chain_inter", *args)
    g_fused = jax.grad(functools.partial(
        mpqe_mod.dense_batch_loss_kernel_fused, chunk=8, interpret=True))(
        params, cfg, "3-chain_inter", *args)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    s = float(jnp.abs(flat_d).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_f) / s, np.asarray(flat_d) / s,
                               rtol=1e-3, atol=1e-3)


def test_blocked_kernel_grads_match_dense(setup):
    _, sampler, cfg, params = setup
    rng = np.random.default_rng(4)
    b = _batch(sampler, "2-chain", rng)
    args = _args(b)
    g_dense = jax.grad(mpqe_mod.dense_batch_loss)(
        params, cfg, "2-chain", *args)
    g_blk = jax.grad(functools.partial(
        mpqe_mod.dense_batch_loss_kernel_blocked,
        queries_per_block=8, chunk=8, interpret=True))(
        params, cfg, "2-chain", *args)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_b, _ = jax.flatten_util.ravel_pytree(g_blk)
    s = float(jnp.abs(flat_d).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_b) / s, np.asarray(flat_d) / s,
                               rtol=5e-2, atol=5e-2)


def test_template_chunked_layout_matches_dense_to_sparse():
    """The on-device chunk layout aggregates identically to the host
    bucketing path (build_edge_store + chunk_by_relation)."""
    from mpqe_tpu.data.batcher import dense_to_sparse
    from mpqe_tpu.ops import pallas_rgcn as pr
    from mpqe_tpu.ops import rgcn as rgcn_ops

    rng = np.random.default_rng(5)
    n_rels = 6
    spec = STRUCTURES["3-chain_inter"]
    edge_rel = rng.integers(0, n_rels, spec.n_edges).astype(np.int32)
    edge_norm = rng.random(spec.n_edges).astype(np.float32)
    ch = template_layout.template_chunked(
        "3-chain_inter", jnp.asarray(edge_rel), jnp.asarray(edge_norm),
        B, chunk=8)
    n_nodes = B * spec.n_nodes
    x = jnp.asarray(rng.normal(size=(n_nodes, D)).astype(np.float32))
    p = rgcn_ops.init_rgcn_layer(jax.random.PRNGKey(1), D, D, n_rels, 4)
    got = pr.rgcn_sparse_fused(x, p, {k: v for k, v in ch.items()},
                               n_rels, interpret=True)
    # oracle: flat edge list through the plain XLA sparse layer
    src = np.asarray(ch["src"])
    dst = np.asarray(ch["dst"])
    norm = np.asarray(ch["norm"])
    rel = np.repeat(edge_rel, B)  # slot-major, matching template_chunked
    want = rgcn_ops.rgcn_sparse(
        x, p, jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), n_rels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_blocked_geometry_all_structures():
    for s in STRUCTURE_NAMES:
        for b in (16, 128, 4096):
            g = template_layout.blocked_geometry(s, b)
            spec = STRUCTURES[s]
            assert g["node_block"] % 8 == 0
            assert g["node_block"] == g["q_per_block"] * spec.n_nodes
            assert (g["q_per_block"] * spec.n_edges) % g["chunk"] == 0
            assert g["n_blocks"] * g["q_per_block"] == b
