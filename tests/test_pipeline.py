"""Async batch pipeline: shapes, determinism of the draw sequence, stop."""

import pytest

from mpqe_tpu.data.pipeline import BatchPipeline
from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.data.store import build_stores
from mpqe_tpu.queries import group_queries_by_formula


@pytest.fixture(scope="module")
def stores():
    kg = make_random_kg(n_entities=80, n_modes=2, n_base_rels=3,
                        n_triples=500, seed=31)
    sampler = QuerySampler(kg, seed=8)
    qs = (sampler.sample_queries("1-chain", 60, n_neg=8)
          + sampler.sample_queries("2-inter", 60, n_neg=8, n_hard_neg=8))
    return build_stores(group_queries_by_formula(qs))


def test_pipeline_yields_batches(stores):
    with BatchPipeline(stores, batch_size=16, n_neg=4, seed=0,
                       device_put=False) as pipe:
        batches = [next(pipe) for _ in range(10)]
    seen_structures = {b.structure for b in batches}
    assert seen_structures <= {"1-chain", "2-inter"}
    assert len(seen_structures) >= 1
    for b in batches:
        assert b.node_entity.shape[0] == 16
        assert b.negatives.shape == (16, 4)
        assert b.query_mask.sum() > 0


def test_pipeline_deterministic_draws(stores):
    def seq(seed):
        with BatchPipeline(stores, batch_size=8, n_neg=2, seed=seed,
                           device_put=False) as pipe:
            return [(next(pipe).structure, next(pipe).target.tolist())
                    for _ in range(5)]

    assert seq(7) == seq(7)
    assert seq(7) != seq(8) or True  # different seeds may coincide; no assert


def test_pipeline_stop_idempotent(stores):
    pipe = BatchPipeline(stores, batch_size=8, n_neg=2, device_put=False).start()
    next(pipe)
    pipe.stop()
    pipe.stop()
