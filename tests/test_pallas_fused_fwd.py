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
    # num_bases=None -> per-relation full weights (w_rel path in
    # _edge_weights).  NOT 0: init_rgcn_layer(num_bases=0) builds a
    # degenerate empty-basis model whose edge messages are all zero.
    cfg = _cfg(num_bases=None)
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
    # relative per-element plus a scaled absolute floor — dividing both
    # sides by the global max would give small-magnitude elements a
    # tolerance proportional to the LARGEST element (ADVICE r3)
    scale = float(jnp.max(jnp.abs(base))) + 1e-9
    np.testing.assert_allclose(np.asarray(sg), np.asarray(base),
                               rtol=1e-5, atol=1e-6 * scale)


def _tree_rel_err(a, b):
    """max over leaves of max|a-b| / (max|b| + eps)."""
    errs = jax.tree_util.tree_map(
        lambda x, y: 0.0 if x.size == 0 else float(
            jnp.max(jnp.abs(x.astype(jnp.float32)
                            - y.astype(jnp.float32)))
            / (jnp.max(jnp.abs(y.astype(jnp.float32))) + 1e-9)),
        a, b)
    return max(jax.tree_util.tree_leaves(errs), default=0.0)


@pytest.mark.parametrize("structure", list(STRUCTURES))
def test_fused_pallas_backward_matches_xla_grads(rng, structure):
    # backward="pallas" runs the reverse-sweep kernel; grads must match
    # the XLA path's to bf16-matmul tolerance (same numerics class)
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(7), cfg)
    ne, nm, er, en = _inputs(rng, structure)
    g = jnp.asarray(rng.normal(size=(ne.shape[0], D)).astype(np.float32))

    _, vjp_p = jax.vjp(lambda p, e: mpqe_mod.encode_dense_fused(
        p, cfg, structure, ne, nm, er, e, None, 8, True,
        False, False, None, "pallas", 8), params, en)
    _, vjp_x = jax.vjp(lambda p, e: mpqe_mod.encode_dense(
        p, cfg, structure, ne, nm, er, e), params, en)
    (dp_p, den_p), (dp_x, den_x) = vjp_p(g), vjp_x(g)
    # bf16 operand rounding compounds once per backward layer against the
    # exact-f32 CPU oracle (layer-2 grads match at ~0.5%, layer-0 at ~7%
    # for the diameter-3 chain at D=16); on TPU the XLA path itself runs
    # bf16 matmuls, so the compiled-mode parity bar lives in
    # tools/tpu_smoke.py — here the tolerance scales with depth
    # measured at D=16: depth-1/2 structures land under 3e-2, the
    # diameter-3 chain at ~0.15 (the structural-exactness test below
    # pins that this is rounding, not a transpose bug)
    tol = {1: 3e-2, 2: 8e-2, 3: 2.5e-1}[mpqe_mod.num_steps(cfg, structure)]
    assert _tree_rel_err(dp_p, dp_x) < tol, structure
    assert _tree_rel_err(den_p, den_x) < tol, structure


def test_fused_pallas_backward_f32_wire_structurally_exact(rng):
    # with the bf16 operand casts disabled (f32_wire) the backward kernel
    # is the exact transpose of the forward computation: parity vs the
    # XLA VJP must be at f32 noise level, proving the reverse sweep and
    # the _layer_matrices vjp mapping are structurally right (the bf16
    # test above then only certifies rounding behavior)
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(12), cfg)
    for structure in STRUCTURES:
        ne, nm, er, en = _inputs(rng, structure)
        g = jnp.asarray(rng.normal(size=(ne.shape[0], D)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            dp_p, den_p, _ = ff.fused_tgt_backward(
                params, cfg, structure, ne, nm, er, en, None, g,
                block=8, interpret=True, f32_wire=True)
            _, vjp_x = jax.vjp(lambda p, e: mpqe_mod.encode_dense(
                p, cfg, structure, ne, nm, er, e), params, en)
            dp_x, den_x = vjp_x(g)
        assert _tree_rel_err(dp_p, dp_x) < 1e-4, structure
        assert _tree_rel_err(den_p, den_x) < 1e-4, structure


def test_fused_pallas_backward_full_weight_model(rng):
    cfg = _cfg(num_bases=None)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(8), cfg)
    ne, nm, er, en = _inputs(rng, "3-chain_inter")
    g = jnp.asarray(rng.normal(size=(ne.shape[0], D)).astype(np.float32))
    _, vjp_p = jax.vjp(lambda p: mpqe_mod.encode_dense_fused(
        p, cfg, "3-chain_inter", ne, nm, er, en, None, 8, True,
        False, False, None, "pallas", 8), params)
    _, vjp_x = jax.vjp(lambda p: mpqe_mod.encode_dense(
        p, cfg, "3-chain_inter", ne, nm, er, en), params)
    (dp_p,), (dp_x,) = vjp_p(g), vjp_x(g)
    assert _tree_rel_err(dp_p, dp_x) < 3e-2


def test_fused_pallas_backward_anchor_rows_forms(rng):
    # tuple and stacked anchor_rows cotangents must agree with the XLA
    # path's (per-slot columns == stacked slices)
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(9), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure)
    slots = mpqe_mod.anchor_gather_slots(cfg, structure)
    cols = tuple(params["emb"]["ent"][ne[:, s]] for s in slots)
    stacked = jnp.stack(cols, axis=1)
    g = jnp.asarray(rng.normal(size=(ne.shape[0], D)).astype(np.float32))

    _, vjp_t = jax.vjp(lambda ar: mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, ar, 8, True,
        False, False, None, "pallas", 8), cols)
    _, vjp_s = jax.vjp(lambda ar: mpqe_mod.encode_dense_fused(
        params, cfg, structure, ne, nm, er, en, ar, 8, True,
        False, False, None, "pallas", 8), stacked)
    _, vjp_x = jax.vjp(lambda ar: mpqe_mod.encode_dense(
        params, cfg, structure, ne, nm, er, en, anchor_rows=ar), stacked)
    (d_t,), (d_s,), (d_x,) = vjp_t(g), vjp_s(g), vjp_x(g)
    assert _tree_rel_err(d_s, d_x) < 3e-2
    for k in range(len(slots)):
        np.testing.assert_allclose(np.asarray(d_t[k]),
                                   np.asarray(d_s[:, k, :]),
                                   rtol=0, atol=0)


def test_fused_pallas_backward_in_train_loss(rng):
    # end-to-end: dense_batch_loss_kernel_fused_fwd(backward="pallas")
    # value+grads vs the plain dense loss
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(10), cfg)
    structure = "2-inter"
    ne, nm, er, en = _inputs(rng, structure)
    B = ne.shape[0]
    tgt = jnp.asarray(rng.integers(0, N_ENT, (B,)).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, N_ENT, (B, 3)).astype(np.int32))
    nmask = jnp.ones((B, 3), jnp.float32)
    qmask = jnp.ones((B,), jnp.float32)

    def loss_pb(p):
        return mpqe_mod.dense_batch_loss_kernel_fused_fwd(
            p, cfg, structure, ne, nm, er, en, tgt, neg, nmask, qmask,
            block=8, interpret=True, backward="pallas", bwd_block=8)

    def loss_x(p):
        return mpqe_mod.dense_batch_loss(
            p, cfg, structure, ne, nm, er, en, tgt, neg, nmask, qmask)

    (vp, gp) = jax.value_and_grad(loss_pb)(params)
    (vx, gx) = jax.value_and_grad(loss_x)(params)
    assert abs(float(vp) - float(vx)) < 3e-2 * max(abs(float(vx)), 1e-3)
    assert _tree_rel_err(gp, gx) < 5e-2


def test_fused_fwd_bf16_config(rng):
    # cfg.dtype=bfloat16: the kernel's inter-layer bf16 casts ARE the
    # bf16 pipeline's numerics (relu-then-cast == cast-then-relu), so
    # the round-3 f32-only guard is gone; parity vs the bf16 XLA path
    cfg = _cfg(dtype=jnp.bfloat16)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(13), cfg)
    for structure in ["3-chain_inter", "2-inter", "3-chain"]:
        ne, nm, er, en = _inputs(rng, structure)
        want = mpqe_mod.encode_dense(params, cfg, structure, ne, nm, er, en)
        got = mpqe_mod.encode_dense_fused(
            params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
        assert got.dtype == jnp.bfloat16
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(want.astype(jnp.float32))) + 1e-9))
        assert err < 3e-2, (structure, err)


def test_shared_negs_fused_fwd_composes(rng):
    # --shared_negatives x --kernel fused_fwd: the composed loss matches
    # the dense-encoder shared-negs loss to kernel tolerance, with both
    # backward modes
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(14), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure)
    B = ne.shape[0]
    tgt = jnp.asarray(rng.integers(0, N_ENT, (B,)).astype(np.int32))
    sneg = jnp.asarray(rng.integers(0, N_ENT, (7,)).astype(np.int32))
    qmask = jnp.ones((B,), jnp.float32)

    base = mpqe_mod.dense_batch_loss_shared_negs(
        params, cfg, structure, ne, nm, er, en, tgt, sneg, qmask)
    for bwd in ("xla", "pallas"):
        got = mpqe_mod.dense_batch_loss_shared_negs(
            params, cfg, structure, ne, nm, er, en, tgt, sneg, qmask,
            encoder="fused_fwd", fused_block=8, fused_backward=bwd,
            fused_bwd_block=8, interpret=True)
        assert abs(float(got) - float(base)) < 3e-2 * max(
            abs(float(base)), 1e-3), bwd

        def loss(p):
            return mpqe_mod.dense_batch_loss_shared_negs(
                p, cfg, structure, ne, nm, er, en, tgt, sneg, qmask,
                encoder="fused_fwd", fused_block=8, fused_backward=bwd,
                fused_bwd_block=8, interpret=True)

        g = jax.grad(loss)(params)

        def loss_base(p):
            return mpqe_mod.dense_batch_loss_shared_negs(
                p, cfg, structure, ne, nm, er, en, tgt, sneg, qmask)

        gb = jax.grad(loss_base)(params)
        assert _tree_rel_err(g, gb) < 8e-2, bwd


@pytest.mark.parametrize("structure", list(STRUCTURES))
def test_fused_multi_matches_encode_dense_multi(rng, structure):
    # per-query-relation fused forward vs the XLA multi path
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(15), cfg)
    spec = STRUCTURES[structure]
    B = 20
    ne = jnp.asarray(rng.integers(0, N_ENT, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
    erq = jnp.asarray(rng.integers(0, N_RELS, (B, spec.n_edges)).astype(np.int32))
    enq = jnp.asarray(rng.uniform(0.5, 1.5, (B, spec.n_edges)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        want = mpqe_mod.encode_dense_multi(params, cfg, structure,
                                           ne, nm, erq, enq)
        got = ff.fused_tgt_forward_multi(params, cfg, structure,
                                         ne, nm, erq, enq,
                                         block=8, interpret=True)
    err = float(jnp.max(jnp.abs(got - want))
                / (jnp.max(jnp.abs(want)) + 1e-9))
    assert err < 3e-2, (structure, err)


def test_fused_multi_consistent_with_shared_rel_kernel(rng):
    # when every query shares the same relations, multi == the shared
    # kernel's forward (same numerics class; not bit-equal: different
    # GEMM groupings)
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(16), cfg)
    structure = "3-chain_inter"
    ne, nm, er, en = _inputs(rng, structure)
    B = ne.shape[0]
    erq = jnp.tile(er[None, :], (B, 1))
    enq = jnp.tile(en[None, :], (B, 1))
    a = ff.fused_tgt_forward_multi(params, cfg, structure, ne, nm,
                                   erq, enq, block=8, interpret=True)
    b = ff.fused_tgt_forward(params, cfg, structure, ne, nm, er, en,
                             block=8, interpret=True)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
    assert err < 3e-2, err


def test_fused_multi_rejects_full_weight(rng):
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg(num_bases=None)
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(17), cfg)
    spec = STRUCTURES["2-chain"]
    B = 8
    ne = jnp.zeros((B, spec.n_nodes), jnp.int32)
    nm = jnp.zeros((B, spec.n_nodes), jnp.int32)
    erq = jnp.zeros((B, spec.n_edges), jnp.int32)
    enq = jnp.ones((B, spec.n_edges), jnp.float32)
    with pytest.raises(ValueError):
        ff.fused_tgt_forward_multi(params, cfg, "2-chain", ne, nm, erq, enq,
                                   block=8, interpret=True)


@pytest.mark.parametrize("oh_operand", [False, True])
def test_fused_fwd_fold_bias_parity(rng, oh_operand):
    # fold_bias moves layer-0's bias into W_0 through a constant-1
    # one-hot column; parity to bf16-of-bias tolerance
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(18), cfg)
    # make biases non-zero (init is zeros)
    for lp in params["layers"]:
        lp["bias"] = jnp.asarray(
            rng.normal(size=lp["bias"].shape).astype(np.float32))
    for structure in ["3-chain_inter", "2-inter"]:
        ne, nm, er, en = _inputs(rng, structure)
        base = ff.fused_tgt_forward(
            params, cfg, structure, ne, nm, er, en, block=8, interpret=True)
        got = ff.fused_tgt_forward(
            params, cfg, structure, ne, nm, er, en, block=8, interpret=True,
            fold_bias=True, onehot_operand=oh_operand)
        err = float(jnp.max(jnp.abs(got - base))
                    / (jnp.max(jnp.abs(base)) + 1e-9))
        assert err < 1e-2, (structure, err)


def test_fused_fwd_out_bf16(rng):
    from mpqe_tpu.ops import pallas_fused_fwd as ff

    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(19), cfg)
    ne, nm, er, en = _inputs(rng, "3-chain_inter")
    base = ff.fused_tgt_forward(
        params, cfg, "3-chain_inter", ne, nm, er, en, block=8,
        interpret=True)
    got = ff.fused_tgt_forward(
        params, cfg, "3-chain_inter", ne, nm, er, en, block=8,
        interpret=True, out_bf16=True)
    # out_bf16 == bf16-rounding of the f32 output (then cast back)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(base.astype(jnp.bfloat16).astype(jnp.float32)),
        rtol=0, atol=0)


def test_fused_fwd_wrapper_out_bf16_fwd_and_grad(rng):
    # out_bf16 through the custom-VJP wrapper (the bench headline path,
    # round 5): forward == bf16-rounded base kernel, and the backward
    # still runs (XLA recompute; cotangent upcast if the caller fed a
    # bf16 one)
    cfg = _cfg()
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(21), cfg)
    ne, nm, er, en = _inputs(rng, "3-chain_inter")
    base = mpqe_mod.encode_dense_fused(
        params, cfg, "3-chain_inter", ne, nm, er, en, None, 8, True)
    got = mpqe_mod.encode_dense_fused(
        params, cfg, "3-chain_inter", ne, nm, er, en, None, 8, True,
        False, False, None, "xla", 1024, True)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(base.astype(jnp.bfloat16).astype(jnp.float32)),
        rtol=0, atol=0)

    def loss(p):
        q = mpqe_mod.encode_dense_fused(
            p, cfg, "3-chain_inter", ne, nm, er, en, None, 8, True,
            False, False, None, "xla", 1024, True)
        return jnp.sum(jnp.sin(q))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)
