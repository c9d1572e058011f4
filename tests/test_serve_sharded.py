"""ShardedQueryServer: answers over a row-sharded entity table match
the single-device QueryServer element-exactly (8-virtual-device mesh).

No [B, n_entities] score matrix exists on any device — the per-shard
local top-k + merge path (parallel/rank_shard) serves the regime where
the table itself exceeds one chip."""

import jax
import numpy as np
import pytest

from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import gqe as gqe_mod
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.parallel import mesh as mesh_lib
from mpqe_tpu.serve import QueryServer, ShardedQueryServer
from mpqe_tpu.train import loop as loop_mod


@pytest.fixture(scope="module")
def setup():
    # 151 entities: NOT divisible by 4 shards — exercises row padding
    kg = make_random_kg(n_entities=151, n_modes=3, n_base_rels=4,
                        n_triples=900, seed=6)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=2, readout="tgt",
    )
    state = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg, loop_mod.TrainConfig())
    mesh = mesh_lib.make_mesh((2, 4), devices=jax.devices()[:8])
    dense = QueryServer(state.params, cfg, kg.entity_mode)
    sharded = ShardedQueryServer(state.params, cfg, kg.entity_mode, mesh)
    return kg, dense, sharded


def test_sharded_matches_dense_topk(setup):
    kg, dense, sharded = setup
    sampler = QuerySampler(kg, seed=2)
    qs = []
    for s in ("1-chain", "2-chain", "2-inter", "3-chain_inter"):
        qs += sampler.sample_queries(s, 5, n_neg=1)
    a_d = dense.answer(qs, k=7)
    a_s = sharded.answer(qs, k=7)
    for d, s_ in zip(a_d, a_s):
        np.testing.assert_allclose(s_.scores, d.scores, rtol=0, atol=1e-6)
        # ids may differ only where scores tie exactly; with random
        # embeddings ties don't occur
        np.testing.assert_array_equal(s_.entity_ids, d.entity_ids)


def test_sharded_mode_masking_and_pad_rows(setup):
    kg, _, sharded = setup
    sampler = QuerySampler(kg, seed=3)
    qs = sampler.sample_queries("2-inter", 8, n_neg=1)
    answers = sharded.answer(qs, k=5)
    for q, a in zip(qs, answers):
        t_mode = q.formula.node_modes[q.formula.spec.target_slot]
        for e in a.entity_ids:
            assert e == -1 or kg.entity_mode[e] == t_mode
        # pad rows (ids >= n_entities) can never appear
        assert (a.entity_ids < kg.n_entities).all()


def test_sharded_k_exceeding_mode_population(setup):
    kg, _, sharded = setup
    # ask for more answers than the rarest mode has entities: the tail
    # must be (-inf, -1) filler, not wrong-mode or pad rows
    counts = np.bincount(kg.entity_mode, minlength=kg.n_modes)
    rare = int(np.argmin(counts))
    sampler = QuerySampler(kg, seed=4)
    q = next(qq for qq in (sampler.sample_query("1-chain", n_neg=1)
                           for _ in range(200))
             if qq.formula.node_modes[1] == rare)
    k = int(counts[rare]) + 3
    a = sharded.answer([q], k=k)[0]
    finite = np.isfinite(a.scores)
    assert finite.sum() == counts[rare]
    assert (a.entity_ids[~finite] == -1).all()


def test_sharded_rejects_gqe(setup):
    kg, _, _ = setup
    cfg = gqe_mod.GQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, decoder="bilinear", intersection="deepsets",
    )
    params = gqe_mod.init_gqe(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh((2, 4), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="MPQE"):
        ShardedQueryServer(params, cfg, kg.entity_mode, mesh)


def test_sharded_serves_over_http(setup):
    """netserve needs only .answer()/.max_batch — the sharded server
    plugs into the HTTP front end unchanged."""
    import json
    import threading
    import urllib.request

    from mpqe_tpu.netserve import make_http_server

    kg, dense, sharded = setup
    srv = make_http_server(sharded, kg, "127.0.0.1", 0, default_k=5,
                           max_wait_ms=1.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        q = QuerySampler(kg, seed=5).sample_query("2-chain", n_neg=1)
        req = urllib.request.Request(
            url + "/v1/answer",
            data=json.dumps({"queries": [{
                "structure": "2-chain", "anchors": list(q.anchors),
                "rels": list(q.formula.rels)}]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        wire = body["answers"][0]
        direct = dense.answer([q], k=5)[0]
        assert wire["entities"] == [int(e) for e in direct.entity_ids]
    finally:
        srv.shutdown()
        srv.batcher.stop()


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_sharded_quantized_table_recall(setup, dtype):
    """Quantized SHARD tables (the memory lever where sharding is
    motivated) keep the ranking close to the f32 sharded server."""
    kg, dense, sharded = setup
    mesh = mesh_lib.make_mesh((2, 4), devices=jax.devices()[:8])
    cfg, params = sharded.cfg, dense.params
    qt = ShardedQueryServer(params, cfg, kg.entity_mode, mesh,
                            table_dtype=dtype)
    sampler = QuerySampler(kg, seed=7)
    qs = sampler.sample_queries("2-chain", 20, n_neg=1)
    a_f = sharded.answer(qs, k=10)
    a_q = qt.answer(qs, k=10)
    overlaps = [
        len(set(f.entity_ids.tolist()) & set(q.entity_ids.tolist())) / 10
        for f, q in zip(a_f, a_q)]
    assert np.mean(overlaps) >= 0.8
    for f, q in zip(a_f, a_q):
        np.testing.assert_allclose(
            q.scores[np.isfinite(q.scores)],
            f.scores[np.isfinite(f.scores)], atol=0.05)


def test_protocol_eval_is_sharding_transparent(setup):
    """evaluate_batched (the AUC/APR protocol eval) over GSPMD-sharded
    params equals the dense result exactly: its table accesses are
    gathers, which XLA lowers to collectives under the row-sharded
    layout — so protocol eval needs no sharded variant, only sharded
    params (full_ranking needed rank_shard because of the [B, N]
    matrix, not the gathers)."""
    from mpqe_tpu.parallel import rank_shard
    from mpqe_tpu.queries import group_queries_by_formula
    from mpqe_tpu.train import evaluation

    kg, dense_srv, sharded_srv = setup
    sampler = QuerySampler(kg, seed=12)
    val = group_queries_by_formula(
        sampler.sample_queries("2-chain", 30, n_neg=8)
        + sampler.sample_queries("2-inter", 30, n_neg=8, n_hard_neg=8))
    cfg, params = sharded_srv.cfg, dense_srv.params
    dense = evaluation.evaluate_batched(
        params, cfg, evaluation.make_eval_set(val))
    p_sh = rank_shard.shard_encode_params(dict(params), sharded_srv.mesh)
    sharded = evaluation.evaluate_batched(
        p_sh, cfg, evaluation.make_eval_set(val))
    assert dense.macro_auc == sharded.macro_auc
    assert dense.macro_apr == sharded.macro_apr
