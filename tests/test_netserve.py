"""HTTP serving layer: schema validation, micro-batching, wire format.

Plumbing tests run on an UNTRAINED model (mode masking and shapes hold
regardless of weights); tests/test_serve.py covers answer quality."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.netserve import (MicroBatcher, QueryValidationError,
                               build_query, make_http_server)
from mpqe_tpu.queries import STRUCTURES
from mpqe_tpu.serve import QueryServer
from mpqe_tpu.train import loop as loop_mod


@pytest.fixture(scope="module")
def setup():
    kg = make_random_kg(n_entities=150, n_modes=3, n_base_rels=4,
                        n_triples=800, seed=4)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=2, num_bases=2, readout="tgt",
    )
    state = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg, loop_mod.TrainConfig())
    server = QueryServer(state.params, cfg, kg.entity_mode)
    return kg, server


# ----------------------------------------------------------------------
# build_query validation
# ----------------------------------------------------------------------
def test_build_query_schema_modes(setup):
    kg, _ = setup
    sampler = QuerySampler(kg, seed=1)
    for s in ("1-chain", "2-chain", "3-chain_inter"):
        ref = sampler.sample_query(s, n_neg=1)
        q = build_query(kg, s, ref.anchors, ref.formula.rels)
        # node modes reconstructed from the schema match the sampled truth
        assert q.formula.node_modes == ref.formula.node_modes
        assert q.anchors == ref.anchors


@pytest.mark.parametrize("mutate,msg", [
    (lambda kg, a, r: ("bogus", a, r), "unknown structure"),
    (lambda kg, a, r: ("2-chain", a + (0,), r), "anchors"),
    (lambda kg, a, r: ("2-chain", a, r[:1]), "relations"),
    (lambda kg, a, r: ("2-chain", (kg.n_entities,), r), "out of range"),
    (lambda kg, a, r: ("2-chain", a, (kg.n_rels, r[1])), "out of range"),
])
def test_build_query_rejects(setup, mutate, msg):
    kg, _ = setup
    ref = QuerySampler(kg, seed=2).sample_query("2-chain", n_neg=1)
    s, a, r = mutate(kg, ref.anchors, ref.formula.rels)
    with pytest.raises(QueryValidationError, match=msg):
        build_query(kg, s, a, r)


def test_build_query_rejects_anchor_domain_mismatch(setup):
    kg, _ = setup
    ref = QuerySampler(kg, seed=3).sample_query("1-chain", n_neg=1)
    rel = ref.formula.rels[0]
    want = kg.rel_id_modes(rel)[0]
    # an entity of a DIFFERENT mode than the relation's domain
    bad = int(np.flatnonzero(kg.entity_mode != want)[0])
    with pytest.raises(QueryValidationError, match="domain"):
        build_query(kg, "1-chain", (bad,), (rel,))


# ----------------------------------------------------------------------
# MicroBatcher
# ----------------------------------------------------------------------
def test_microbatcher_coalesces_and_orders(setup):
    kg, server = setup
    sampler = QuerySampler(kg, seed=5)
    qs = sampler.sample_queries("2-chain", 6, n_neg=1)
    b = MicroBatcher(server, max_batch=64, max_wait_ms=50)
    # submit BEFORE starting the worker: deterministically one batch
    futs = [b.submit([q], k=5) for q in qs]
    fk = b.submit(qs[:2], k=3)  # different k in the same drain
    b.start()
    try:
        answers = [f.result(timeout=60) for f in futs]
        ak = fk.result(timeout=60)
    finally:
        b.stop()
    assert b.batch_sizes[0] == 8  # all 8 queries in one coalesced dispatch
    assert all(len(a) == 1 and a[0].entity_ids.shape == (5,)
               for a in answers)
    assert len(ak) == 2 and ak[0].entity_ids.shape == (3,)
    # per-request answers align with a directly-dispatched reference
    direct = server.answer(qs, k=5)
    for a, d in zip(answers, direct):
        np.testing.assert_array_equal(a[0].entity_ids, d.entity_ids)


def test_microbatcher_propagates_errors(setup):
    kg, server = setup

    class Boom(Exception):
        pass

    class Broken:
        def answer(self, queries, k):
            raise Boom("device on fire")

    b = MicroBatcher(Broken(), max_wait_ms=1)
    fut = b.submit([QuerySampler(kg, seed=6).sample_query("1-chain")], k=2)
    b.start()
    try:
        with pytest.raises(Boom):
            fut.result(timeout=30)
    finally:
        b.stop()


# ----------------------------------------------------------------------
# HTTP server end-to-end
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def httpd(setup):
    kg, server = setup
    srv = make_http_server(server, kg, "127.0.0.1", 0, default_k=7,
                           max_wait_ms=2.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield kg, srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.batcher.stop()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/v1/answer", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_http_healthz(httpd):
    kg, _, url = httpd
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] and body["n_entities"] == kg.n_entities
    assert "3-chain_inter" in body["structures"]


def test_http_answer_mode_masked(httpd):
    kg, _, url = httpd
    sampler = QuerySampler(kg, seed=7)
    qs = (sampler.sample_queries("1-chain", 3, n_neg=1)
          + sampler.sample_queries("2-inter", 3, n_neg=1))
    payload = {"queries": [
        {"structure": q.formula.structure, "anchors": list(q.anchors),
         "rels": list(q.formula.rels)} for q in qs], "k": 6}
    status, body = _post(url, payload)
    assert status == 200 and len(body["answers"]) == 6
    for q, a in zip(qs, body["answers"]):
        assert len(a["entities"]) == 6
        assert a["scores"] == sorted(a["scores"], reverse=True)
        t_mode = q.formula.node_modes[STRUCTURES[
            q.formula.structure].target_slot]
        assert all(kg.entity_mode[e] == t_mode for e in a["entities"])


def test_http_concurrent_requests_coalesce(httpd):
    kg, srv, url = httpd
    sampler = QuerySampler(kg, seed=8)
    qs = sampler.sample_queries("2-chain", 8, n_neg=1)
    n_before = len(srv.batcher.batch_sizes)
    results = [None] * len(qs)

    def fire(i, q):
        results[i] = _post(url, {"queries": [{
            "structure": q.formula.structure, "anchors": list(q.anchors),
            "rels": list(q.formula.rels)}]})

    threads = [threading.Thread(target=fire, args=(i, q))
               for i, q in enumerate(qs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and r[0] == 200 for r in results)
    sizes = list(srv.batcher.batch_sizes)[n_before:]
    assert sum(sizes) == len(qs)
    # 8 concurrent single-query requests used fewer than 8 dispatches
    # (max_wait 2 ms is enough on localhost; allow equality headroom of 1)
    assert len(sizes) <= len(qs)


def test_http_rejects_bad_requests(httpd):
    _, _, url = httpd
    for payload, frag in [
        ({}, "queries"),
        ({"queries": []}, "queries"),
        ({"queries": [{"structure": "nope", "anchors": [0], "rels": [0]}]},
         "unknown structure"),
        ({"queries": [{"structure": "1-chain", "anchors": [0],
                       "rels": [0]}], "k": 0}, "k="),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, payload)
        assert e.value.code == 400
        assert frag in json.loads(e.value.read())["error"]


def test_microbatcher_stop_fails_orphans(setup):
    kg, server = setup
    q = QuerySampler(kg, seed=9).sample_query("1-chain")
    b = MicroBatcher(server, max_wait_ms=1)
    # never started: stop() must fail queued futures instead of leaving
    # their handlers blocked until the request timeout
    fut = b.submit([q], k=2)
    b.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)
    # submit after stop fails fast
    with pytest.raises(RuntimeError, match="stopped"):
        b.submit([q], k=2).result(timeout=5)


def test_build_query_rejects_chain_mode_mismatch(setup):
    kg, _ = setup
    # find (r0, r1) where r0's range != r1's domain: the variable slot in
    # the middle of a 2-chain makes the inconsistency invisible to
    # anchor-only checks
    rels = range(kg.n_rels)
    bad = next(((a, b) for a in rels for b in rels
                if kg.rel_id_modes(a)[1] != kg.rel_id_modes(b)[0]), None)
    assert bad is not None
    import numpy as np
    anchor = int(np.flatnonzero(
        kg.entity_mode == kg.rel_id_modes(bad[0])[0])[0])
    with pytest.raises(QueryValidationError, match="domain"):
        build_query(kg, "2-chain", (anchor,), bad)


def test_build_query_rejects_intersection_range_disagreement(setup):
    kg, _ = setup
    rels = range(kg.n_rels)
    pair = next(((a, b) for a in rels for b in rels
                 if kg.rel_id_modes(a)[1] != kg.rel_id_modes(b)[1]), None)
    assert pair is not None
    import numpy as np
    a0 = int(np.flatnonzero(
        kg.entity_mode == kg.rel_id_modes(pair[0])[0])[0])
    a1 = int(np.flatnonzero(
        kg.entity_mode == kg.rel_id_modes(pair[1])[0])[0])
    with pytest.raises(QueryValidationError, match="disagree"):
        build_query(kg, "2-inter", (a0, a1), pair)


def test_http_rejects_non_object_bodies(httpd):
    """Malformed JSON shapes get a 400, not a dropped connection."""
    _, _, url = httpd
    for payload in ([], "x", {"queries": [5]}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, payload)
        assert e.value.code == 400


def test_http_statz(httpd):
    kg, srv, url = httpd
    # ensure at least one dispatch happened (other tests in this module
    # already fired requests, but be self-sufficient)
    q = QuerySampler(kg, seed=11).sample_query("1-chain", n_neg=1)
    _post(url, {"queries": [{"structure": "1-chain",
                             "anchors": list(q.anchors),
                             "rels": list(q.formula.rels)}]})
    with urllib.request.urlopen(url + "/statz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["total_dispatches"] >= 1
    assert body["total_queries"] >= 1
    assert body["mean_queries_per_dispatch"] > 0
    assert isinstance(body["recent_dispatch_sizes"], list)
