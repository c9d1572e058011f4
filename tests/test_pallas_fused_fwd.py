"""Fused whole-forward kernel (ops/pallas_fused_fwd) vs encode_dense —
interpreter mode; compiled-mode parity/perf via tools/fused_fwd_bench.py
on the chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import STRUCTURES

D = 16
N_ENT = 50
N_MODES = 3
N_RELS = 9


def _inputs(rng, structure, B=20):
    spec = STRUCTURES[structure]
    ne = jnp.asarray(rng.integers(0, N_ENT, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, N_RELS, (spec.n_edges,)).astype(np.int32))
    en = jnp.asarray(rng.uniform(0.5, 1.5, (spec.n_edges,)).astype(np.float32))
    return ne, nm, er, en


def _cfg(**kw):
    base = dict(n_entities=N_ENT, n_modes=N_MODES, n_rels=N_RELS,
                embed_dim=D, n_layers=3, num_bases=4, readout="tgt")
    base.update(kw)
    return mpqe_mod.MPQEConfig(**base)


@pytest.mark.parametrize("structure", list(STRUCTURES))
def test_fused_fwd_matches_encode_dense(rng, structure):
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(1), cfg)
    ne, nm, er, en = _inputs(rng, structure)
    with jax.default_matmul_precision("highest"):
        want = mpqe_mod.encode_dense(params, cfg, structure, ne, nm, er, en)
        got = mpqe_mod.encode_dense_fused(
            params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
    # block=8 with B=20 exercises the row-padding path; bf16-operand
    # matmuls in the kernel vs HIGHEST on the oracle side
    err = float(jnp.max(jnp.abs(got - want))
                / (jnp.max(jnp.abs(want)) + 1e-9))
    assert err < 3e-2, (structure, err)


def test_fused_fwd_full_weight_model(rng):
    # num_bases=0 -> per-relation full weights (w_rel path in _edge_weights)
    cfg = _cfg(num_bases=0)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(2), cfg)
    ne, nm, er, en = _inputs(rng, "3-chain_inter")
    with jax.default_matmul_precision("highest"):
        want = mpqe_mod.encode_dense(params, cfg, "3-chain_inter",
                                     ne, nm, er, en)
        got = mpqe_mod.encode_dense_fused(
            params, cfg, "3-chain_inter", ne, nm, er, en,
            block=8, interpret=True)
    err = float(jnp.max(jnp.abs(got - want))
                / (jnp.max(jnp.abs(want)) + 1e-9))
    assert err < 3e-2, err


def test_fused_fwd_anchor_rows_path(rng):
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure)
    slots = mpqe_mod.anchor_gather_slots(cfg, structure)
    rows = jnp.stack([params["emb"]["ent"][ne[:, s]] for s in slots], axis=1)
    got = mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, anchor_rows=rows,
        block=8, interpret=True)
    ref = mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0)


def test_fused_fwd_grads_match_xla_path_exactly(rng):
    # the custom-VJP backward recomputes through encode_dense, so grads
    # must be bit-identical to differentiating the XLA path directly
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(4), cfg)
    ne, nm, er, en = _inputs(rng, "2-inter")

    def loss_fused(p, en_):
        q = mpqe_mod.encode_dense_fused(
            p, cfg, "2-inter", ne, nm, er, en_, None, 8, True)
        return jnp.sum(jnp.sin(q))

    def loss_xla(p, en_):
        q = mpqe_mod.encode_dense(p, cfg, "2-inter", ne, nm, er, en_)
        return jnp.sum(jnp.sin(q))

    # primal values differ (bf16 kernel vs XLA) -> cotangents seeded by
    # sin'(q) differ too; compare against the XLA-loss grads seeded from
    # the SAME primal by checking the VJP itself instead
    _, vjp_f = jax.vjp(lambda p, e: mpqe_mod.encode_dense_fused(
        p, cfg, "2-inter", ne, nm, er, e, None, 8, True), params, en)
    _, vjp_x = jax.vjp(lambda p, e: mpqe_mod.encode_dense(
        p, cfg, "2-inter", ne, nm, er, e), params, en)
    g = jnp.asarray(rng.normal(size=(ne.shape[0], D)).astype(np.float32))
    df, dx = vjp_f(g), vjp_x(g)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0),
        df, dx)


def test_fused_fwd_rejects_non_tgt_readout(rng):
    cfg = _cfg(readout="sum")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(5), cfg)
    ne, nm, er, en = _inputs(rng, "2-chain")
    with pytest.raises(ValueError):
        mpqe_mod.encode_dense_fused(
            params, cfg, "2-chain", ne, nm, er, en, block=8, interpret=True)


def test_fused_fwd_composes_with_shard_map_dp(rng):
    # the fused kernel runs per-device under a DP shard_map (each device
    # sees its local batch block) — interpret mode on the 8-device CPU mesh
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mpqe_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh((8, 1))
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(9), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure, B=32)

    def enc(p, ne_, nm_):
        return mpqe_mod.encode_dense_fused(
            p, cfg, structure, ne_, nm_, er, en, None, 4, True)

    sharded = shard_map(
        enc, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    got = sharded(params, ne, nm)
    want = enc(params, ne, nm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_fwd_tuple_anchor_rows_fwd_and_grad(rng):
    # anchor_rows may be a tuple of per-slot [B, d] arrays (zero-copy
    # kernel feed); parity + VJP must match the stacked [B, A, d] form
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(11), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure)
    slots = mpqe_mod.anchor_gather_slots(cfg, structure)
    cols = tuple(params["emb"]["ent"][ne[:, s]] for s in slots)
    stacked = jnp.stack(cols, axis=1)

    got = mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, cols, 8, True)
    want = mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, stacked, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)

    g = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    _, vjp_t = jax.vjp(lambda ar: mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, ar, 8, True), cols)
    _, vjp_s = jax.vjp(lambda ar: mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, ar, 8, True), stacked)
    (d_t,), (d_s,) = vjp_t(g), vjp_s(g)
    for k in range(len(slots)):
        np.testing.assert_allclose(np.asarray(d_t[k]),
                                   np.asarray(d_s[:, k, :]),
                                   rtol=0, atol=0)


@pytest.mark.parametrize("structure", ["3-chain_inter", "2-inter", "3-chain"])
def test_fused_fwd_onehot_operand_bit_exact(rng, structure):
    # onehot_operand=True ships the packed variable one-hot as a prebuilt
    # bf16 operand instead of expanding ids in-kernel; the operand holds
    # exactly the values the kernel builds, so outputs are BIT-identical
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
    ne, nm, er, en = _inputs(rng, structure)
    base = ff.fused_tgt_forward(
        params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
    oh = ff.fused_tgt_forward(
        params, cfg, structure, ne, nm, er, en, block=8, interpret=True,
        onehot_operand=True)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(base),
                               rtol=0, atol=0)


@pytest.mark.parametrize("structure", ["3-chain_inter", "2-inter", "3-chain"])
@pytest.mark.parametrize("oh_operand", [False, True])
def test_fused_fwd_split_gemm_matches_concat(rng, structure, oh_operand):
    # split_gemm=True replaces the layer-0 concat with per-operand-block
    # GEMMs against d_pad-row slices of W_0, f32-accumulated; identical
    # MACs, accumulation order may differ from the single wide GEMM
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
    ne, nm, er, en = _inputs(rng, structure)
    base = ff.fused_tgt_forward(
        params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
    sg = ff.fused_tgt_forward(
        params, cfg, structure, ne, nm, er, en, block=8, interpret=True,
        onehot_operand=oh_operand, split_gemm=True)
    scale = float(jnp.max(jnp.abs(base))) + 1e-9
    np.testing.assert_allclose(np.asarray(sg) / scale,
                               np.asarray(base) / scale, atol=1e-6)
