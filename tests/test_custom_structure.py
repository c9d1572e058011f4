"""Custom query-DAG registration: the reference hardcodes 7 templates;
here register_structure() gives a new shape the whole stack — sampler,
packers, training, eval, serving — without touching any of it."""

import os

import jax
import numpy as np
import pytest

from mpqe_tpu.data.sampler import QuerySampler, make_rule_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import (INTERSECTION_STRUCTURES, STRUCTURES,
                              group_queries_by_formula,
                              register_structure)
from mpqe_tpu.serve import QueryServer
from mpqe_tpu.train import evaluation, loop as loop_mod


@pytest.fixture(scope="module")
def custom():
    # a0 -r0-> v0 -r1-> v1 -r2-> v2 -r3-> t   (4-chain, diameter 4)
    if "4-chain" not in STRUCTURES:
        register_structure("4-chain", n_anchors=1, n_vars=3,
                           edges=[(0, 1), (1, 2), (2, 3), (3, 4)])
    # a0 -r0-> v0 -r1-> t <-r2- a1  (chain meeting an intersection)
    if "2-inter_chain2" not in STRUCTURES:
        register_structure("2-inter_chain2", n_anchors=2, n_vars=1,
                           edges=[(0, 2), (2, 3), (1, 3)])
    return STRUCTURES["4-chain"], STRUCTURES["2-inter_chain2"]


def test_register_validates(custom):
    with pytest.raises(ValueError, match="already registered"):
        register_structure("4-chain", 1, 3,
                           [(0, 1), (1, 2), (2, 3), (3, 4)])
    with pytest.raises(ValueError, match="src < dst"):
        register_structure("bad1", 1, 1, [(1, 0), (0, 2)])
    with pytest.raises(ValueError, match="anchor slot"):
        register_structure("bad2", 2, 0, [(0, 1), (1, 2)])
    with pytest.raises(ValueError, match="disconnected"):
        register_structure("bad3", 1, 2, [(0, 3), (1, 3)])
    with pytest.raises(ValueError, match="backward walk"):
        register_structure("bad4", 1, 1, [(1, 2), (0, 1)])
    # a source-only VARIABLE slot passes the backward walk but can never
    # be bound by propagation — must be rejected here, not crash the
    # sampler with a bare AssertionError later
    with pytest.raises(ValueError, match="incoming edge"):
        register_structure("bad5", 1, 1, [(0, 2), (1, 2)])


def test_register_spec_properties(custom):
    four, ic = custom
    assert four.diameter == 4 and four.target_slot == 4
    assert "4-chain" not in INTERSECTION_STRUCTURES
    assert ic.diameter == 2
    # node 3 has two in-edges -> intersection (hard-negative protocol)
    assert "2-inter_chain2" in INTERSECTION_STRUCTURES


def test_custom_structures_train_eval_serve(custom):
    # band: set-valued relations, so intersections have strict-subset
    # conjunct images (nonempty hard-negative pools); torus relations
    # are bijections and would make every hard pool empty by construction
    kg = make_rule_kg(n_entities=200, n_modes=2, n_base_rels=4,
                      out_degree=1, seed=21, variant="band")
    sampler = QuerySampler(kg, seed=2)
    train_q = (sampler.all_edge_queries(n_neg=8)
               + sampler.sample_queries("4-chain", 150, n_neg=8)
               + sampler.sample_queries("2-inter_chain2", 150, n_neg=8,
                                        n_hard_neg=8))
    # intersection hard negatives flow through the generic sampler
    assert any(q.hard_neg_samples for q in train_q
               if q.formula.structure == "2-inter_chain2")
    val_q = (sampler.sample_queries("4-chain", 30, n_neg=16)
             + sampler.sample_queries("2-inter_chain2", 30, n_neg=16))
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=16, n_layers=4, num_bases=2, readout="tgt",
    )
    tc = loop_mod.TrainConfig(lr=0.01, batch_size=64, n_neg=4,
                              max_steps=400, conv_tol=1e-4,
                              val_every=100_000)
    state = loop_mod.init_train_state(jax.random.PRNGKey(0), cfg, tc)
    state = loop_mod.run_train(
        state, cfg, tc, group_queries_by_formula(train_q))
    res = evaluation.evaluate_batched(
        state.params, cfg, evaluation.make_eval_set(
            group_queries_by_formula(val_q)))
    assert "4-chain" in res.auc_by_structure
    assert "2-inter_chain2" in res.auc_by_structure
    assert np.isfinite(res.macro_auc)

    # serving answers custom-structure queries too
    server = QueryServer(state.params, cfg, kg.entity_mode)
    answers = server.answer(val_q[:8], k=5)
    assert all(a.entity_ids.shape == (5,) for a in answers)

    # full ranking over the custom structures
    rk = evaluation.full_ranking(
        state.params, cfg, group_queries_by_formula(val_q),
        kg.entity_mode, hits_at=(1, 5))
    assert set(rk) == {"4-chain", "2-inter_chain2"}


def test_custom_structures_cli_round_trip(tmp_path):
    """--custom_structures registers templates from JSON before data
    loading; evaluate.py and serve.py re-register from the saved run
    config so a custom-structure checkpoint round-trips."""
    import json

    import evaluate as eval_mod
    import serve as serve_mod
    import train as train_mod

    spec_path = str(tmp_path / "structs.json")
    with open(spec_path, "w") as f:
        json.dump([{"name": "cli-4-chain", "n_anchors": 1, "n_vars": 3,
                    "edges": [[0, 1], [1, 2], [2, 3], [3, 4]]}], f)
    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "4",
        "--num_bases", "2", "--steps", "60", "--val_every", "50",
        "--batch_size", "32", "--n_neg", "2",
        "--custom_structures", spec_path,
        "--structures", "1-chain,cli-4-chain",
        "--syn_entities", "150", "--syn_triples", "600",
        "--syn_train_queries", "200", "--syn_val_queries", "40",
        "--run_dir", run_dir,
    ])
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read()
    assert "cli-4-chain" in lines
    eval_mod.main(["--run_dir", run_dir, "--n_neg", "8"])
    serve_mod.main(["--run_dir", run_dir, "--requests", "4",
                    "--batch", "2", "--structures", "cli-4-chain"])


def test_random_dag_fuzz_through_full_stack():
    """15 random valid query DAGs (1-3 anchors, 0-2 vars, optional extra
    intersection edge) each go register -> sample -> pack -> encode ->
    batched eval without touching any stack code — the generalization
    the reference's hard-coded template dicts cannot make."""
    rng = np.random.default_rng(7)
    kg = make_rule_kg(n_entities=200, n_modes=2, n_base_rels=4,
                      out_degree=1, seed=5, variant="band")
    sampler = QuerySampler(kg, seed=3)
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=8, n_layers=2, num_bases=2, readout="tgt")
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)

    import mpqe_tpu.queries as queries_mod

    before = dict(STRUCTURES)
    before_inter = set(INTERSECTION_STRUCTURES)
    try:
        _fuzz_loop(rng, sampler, cfg, params)
    finally:
        # registration is module-global; don't leak 15+ fuzz templates
        # into later tests in the same process
        STRUCTURES.clear()
        STRUCTURES.update(before)
        INTERSECTION_STRUCTURES.clear()
        INTERSECTION_STRUCTURES.update(before_inter)
        assert queries_mod.STRUCTURES is STRUCTURES  # same object, safe


def _fuzz_loop(rng, sampler, cfg, params):
    made = 0
    for trial in range(80):
        if made >= 15:
            break
        a = int(rng.integers(1, 4))
        v = int(rng.integers(0, 3))
        n = a + v + 1
        t = n - 1
        # each anchor walks an increasing-slot path through a random
        # subset of the vars to the target; every var lands on >=1 path
        assign = [[] for _ in range(a)]
        for vs in range(a, a + v):
            assign[int(rng.integers(0, a))].append(vs)
        edges = set()
        for ai in range(a):
            seq = [ai] + sorted(assign[ai]) + [t]
            edges.update(zip(seq, seq[1:]))
        if rng.random() < 0.5 and n > 2:
            # extra incoming edge into a random var/target slot
            d = int(rng.integers(a, n))
            s = int(rng.integers(0, d))
            edges.add((s, d))
        edges = sorted(edges, key=lambda e: (e[1], e[0]))
        name = f"fuzz-{trial}-a{a}v{v}"
        try:
            spec = register_structure(name, a, v, edges)
        except ValueError:
            continue  # extra edge occasionally makes an anchor a sink
        try:
            qs = sampler.sample_queries(name, 8, n_neg=4)
        except RuntimeError:
            continue  # shape unsatisfiable on this KG (mode constraints)
        made += 1
        assert all(len(q.anchors) == a for q in qs)
        res = evaluation.evaluate_batched(
            params, cfg, evaluation.make_eval_set(
                group_queries_by_formula(qs)), n_neg=4)
        assert name in res.auc_by_structure
        assert np.isfinite(res.auc_by_structure[name])
        assert spec.diameter >= 1
    assert made >= 15


def test_custom_structures_name_collision_rejected(tmp_path):
    """A spec whose name is already registered with a DIFFERENT template
    must error, not silently train on the wrong DAG; the IDENTICAL spec
    stays idempotent (resume/eval reloads)."""
    import json

    import train as train_mod

    # identical to the canonical 2-chain -> idempotent, loads fine
    ok_path = str(tmp_path / "ok.json")
    with open(ok_path, "w") as f:
        json.dump([{"name": "2-chain", "n_anchors": 1, "n_vars": 1,
                    "edges": [[0, 1], [1, 2]]}], f)
    args = train_mod.parse_args([
        "--data", "synthetic", "--structures", "1-chain",
        "--custom_structures", ok_path,
        "--syn_entities", "80", "--syn_triples", "300",
        "--syn_train_queries", "50", "--syn_val_queries", "10",
    ])
    train_mod.load_data(args)

    # same name, different edges -> hard error
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as f:
        json.dump([{"name": "2-chain", "n_anchors": 2, "n_vars": 0,
                    "edges": [[0, 2], [1, 2]]}], f)
    args = train_mod.parse_args([
        "--data", "synthetic", "--structures", "1-chain",
        "--custom_structures", bad_path,
        "--syn_entities", "80", "--syn_triples", "300",
        "--syn_train_queries", "50", "--syn_val_queries", "10",
    ])
    with pytest.raises(ValueError, match="DIFFERENT template"):
        train_mod.load_data(args)
