"""Neighborhood encoder (GQE GraphSAGE path): table build + aggregation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.data.sampler import make_random_kg
from mpqe_tpu.models import aggregators as agg_mod

D = 16


@pytest.fixture(scope="module")
def kg():
    return make_random_kg(n_entities=60, n_modes=2, n_base_rels=3,
                          n_triples=300, seed=51)


def test_neighbor_table(kg):
    t = agg_mod.build_neighbor_table(kg, fanout=4, seed=0)
    assert t["idx"].shape == (kg.n_entities, 4)
    assert t["mask"].shape == (kg.n_entities, 4)
    src, _, dst = kg.directed_edges()
    neigh = {}
    for s, d_ in zip(src, dst):
        neigh.setdefault(int(s), set()).add(int(d_))
    for e in range(kg.n_entities):
        for j in range(4):
            if t["mask"][e, j] > 0:
                assert t["idx"][e, j] in neigh.get(e, set())
            else:
                assert t["idx"][e, j] == e  # self-padding


@pytest.mark.parametrize("aggregator", ["mean", "max", "pool"])
def test_encode_entities_shapes(kg, aggregator):
    t = agg_mod.build_neighbor_table(kg, fanout=4)
    params = agg_mod.init_neighborhood_encoder(
        jax.random.PRNGKey(0), D, aggregator)
    ent = jax.random.normal(jax.random.PRNGKey(1), (kg.n_entities, D))
    ids = jnp.asarray(np.array([[0, 1], [2, 3]], np.int32))
    out = agg_mod.encode_entities(
        params, ent, jnp.asarray(t["idx"]), jnp.asarray(t["mask"]),
        ids, aggregator)
    assert out.shape == (2, 2, D)
    assert np.isfinite(np.asarray(out)).all()


def test_mean_aggregation_matches_manual(kg):
    t = agg_mod.build_neighbor_table(kg, fanout=4, seed=3)
    params = agg_mod.init_neighborhood_encoder(jax.random.PRNGKey(2), D, "mean")
    ent = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (kg.n_entities, D)))
    e = int(np.argmax(t["mask"].sum(1)))  # entity with most neighbors
    out = np.asarray(agg_mod.encode_entities(
        params, jnp.asarray(ent), jnp.asarray(t["idx"]),
        jnp.asarray(t["mask"]), jnp.asarray(np.array([e], np.int32)), "mean"))
    m = t["mask"][e]
    manual_agg = (ent[t["idx"][e]] * m[:, None]).sum(0) / max(m.sum(), 1.0)
    manual = np.maximum(
        np.concatenate([ent[e], manual_agg]) @ np.asarray(params["w_combine"])
        + np.asarray(params["b_combine"]), 0.0)
    np.testing.assert_allclose(out[0], manual, rtol=2e-4, atol=2e-5)
