"""Sharded full-ranking / top-k (parallel/rank_shard) vs the dense
single-device sweep — 8-fake-device CPU mesh (ranks element-exact,
scores to float tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.parallel import mesh as mesh_lib, rank_shard

D = 16
N_ENT = 109  # deliberately NOT divisible by 8 — exercises row padding
N_MODES = 3


@pytest.fixture(scope="module")
def mesh18():
    return mesh_lib.make_mesh((1, 8))


@pytest.fixture(scope="module")
def setup(mesh18):
    cfg = mpqe_mod.MPQEConfig(
        n_entities=N_ENT, n_modes=N_MODES, n_rels=6, embed_dim=D,
        n_layers=2, num_bases=None, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    entity_mode = rng.integers(0, N_MODES, N_ENT).astype(np.int32)
    B = 24
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, N_ENT, B).astype(np.int32))
    return cfg, params, jnp.asarray(entity_mode), q, target


def _dense_rank(cfg, params, entity_mode, q, target):
    scores = np.asarray(mpqe_mod.score_all_entities(params, cfg, q))
    em = np.asarray(entity_mode)
    tgt = np.asarray(target)
    mode_ok = em[None, :] == em[tgt][:, None]
    scores = np.where(mode_ok, scores, -np.inf)
    true_s = scores[np.arange(len(tgt)), tgt]
    return 1 + (scores > true_s[:, None]).sum(axis=1)


def test_sharded_rank_matches_dense(mesh18, setup):
    cfg, params, entity_mode, q, target = setup
    ent_s, mode_s, _ = rank_shard.shard_table(
        mesh18, params["emb"]["ent"], entity_mode)
    fn = rank_shard.make_sharded_rank_fn(mesh18, cfg)
    got = np.asarray(fn(ent_s, mode_s, q, target))
    want = _dense_rank(cfg, params, entity_mode, q, target)
    np.testing.assert_array_equal(got, want)


def test_sharded_rank_unnormalized_scores(mesh18, setup):
    cfg, params, entity_mode, q, target = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, scale_scores=False)
    ent_s, mode_s, _ = rank_shard.shard_table(
        mesh18, params["emb"]["ent"], entity_mode)
    fn = rank_shard.make_sharded_rank_fn(mesh18, cfg2)
    got = np.asarray(fn(ent_s, mode_s, q, target))
    want = _dense_rank(cfg2, params, entity_mode, q, target)
    np.testing.assert_array_equal(got, want)


def test_sharded_topk_matches_dense(mesh18, setup):
    cfg, params, entity_mode, q, target = setup
    k = 7
    ent_s, mode_s, _ = rank_shard.shard_table(
        mesh18, params["emb"]["ent"], entity_mode)
    fn = rank_shard.make_sharded_topk_fn(mesh18, cfg, k)
    answer_mode = jnp.asarray(entity_mode)[target]
    v, ids = fn(ent_s, mode_s, q, answer_mode)
    v, ids = np.asarray(v), np.asarray(ids)

    scores = np.asarray(mpqe_mod.score_all_entities(params, cfg, q))
    em = np.asarray(entity_mode)
    masked = np.where(em[None, :] == np.asarray(answer_mode)[:, None],
                      scores, -np.inf)
    # compare the score SETS (ties may order differently across shards;
    # per-shard matmul reduction order differs from the dense sweep's at
    # the last-ulp level, so compare to float tolerance)
    want_v = -np.sort(-masked, axis=1)[:, :k]
    np.testing.assert_allclose(v, want_v, rtol=1e-5, atol=1e-6)
    # every returned id is real (never a pad row) and scores match
    assert ids.max() < N_ENT
    np.testing.assert_allclose(
        v, np.take_along_axis(masked, ids, axis=1), rtol=1e-5, atol=1e-6)


def test_sharded_rank_batch_with_model_encoder(mesh18, setup):
    # end-to-end: encode queries with the model, rank through the
    # sharded sweep, compare against the dense path
    from mpqe_tpu.queries import STRUCTURES
    cfg, params, entity_mode, _, _ = setup
    rng = np.random.default_rng(3)
    spec = STRUCTURES["2-chain"]
    B = 16
    ne = jnp.asarray(rng.integers(0, N_ENT, (B, spec.n_nodes)).astype(np.int32))
    nm = jnp.asarray(rng.integers(0, N_MODES, (B, spec.n_nodes)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, 6, (spec.n_edges,)).astype(np.int32))
    en = jnp.asarray(np.ones((spec.n_edges,), np.float32))
    target = jnp.asarray(rng.integers(0, N_ENT, B).astype(np.int32))
    q = mpqe_mod.encode_dense(params, cfg, "2-chain", ne, nm, er, en)

    ent_s, mode_s, _ = rank_shard.shard_table(
        mesh18, params["emb"]["ent"], entity_mode)
    fn = rank_shard.make_sharded_rank_fn(mesh18, cfg)
    got = np.asarray(fn(ent_s, mode_s, q, target))
    want = _dense_rank(cfg, params, entity_mode, q, target)
    np.testing.assert_array_equal(got, want)


def test_sharded_topk_scarce_mode_returns_sentinel_ids(mesh18, setup):
    # a mode with fewer than k candidates must yield (-inf, -1) filler,
    # never a real-looking wrong-mode or pad-row id
    cfg, params, entity_mode, q, _ = setup
    em = np.asarray(entity_mode).copy()
    em[:] = 0
    em[:2] = 1  # exactly two entities of mode 1
    ent_s, mode_s, _ = rank_shard.shard_table(
        mesh18, params["emb"]["ent"], jnp.asarray(em))
    k = 5
    fn = rank_shard.make_sharded_topk_fn(mesh18, cfg, k)
    answer_mode = jnp.ones((q.shape[0],), jnp.int32)
    v, ids = fn(ent_s, mode_s, q, answer_mode)
    v, ids = np.asarray(v), np.asarray(ids)
    assert np.isfinite(v[:, :2]).all() and set(ids[:, :2].flat) <= {0, 1}
    assert (~np.isfinite(v[:, 2:])).all()
    assert (ids[:, 2:] == -1).all()
