"""CLI drivers end-to-end: train.py -> run dir -> evaluate.py."""

import json
import os

def test_train_then_evaluate(tmp_path):
    import train as train_mod
    import evaluate as eval_mod

    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "60", "--val_every", "50",
        "--batch_size", "32", "--n_neg", "4",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "200", "--syn_val_queries", "40",
        "--run_dir", run_dir,
    ])
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "model_config.json"))
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    assert any('"loss"' in ln for ln in lines)
    assert any('"checkpoint"' in ln for ln in lines)

    eval_mod.main(["--run_dir", run_dir, "--split", "--n_neg", "16",
                   "--ranking", "--hits_at", "1,5"])

    # serving CLI answers queries from the same checkpoint
    import serve as serve_mod
    serve_mod.main(["--run_dir", run_dir, "--requests", "6", "--batch", "2",
                    "--structures", "1-chain"])


def test_train_parallel_halo_cli(tmp_path):
    """--parallel halo_ring trains through the edge-partitioned shard_map
    layers on the virtual CPU mesh (conftest forces 8 fake devices)."""
    import train as train_mod

    run_dir = str(tmp_path / "run")
    state = train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "2",
        "--num_bases", "4", "--steps", "30", "--val_every", "25",
        "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain,2-chain",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "120", "--syn_val_queries", "24",
        "--parallel", "halo_ring", "--mesh", "8,1",
        "--run_dir", run_dir,
    ])
    assert state.step == 30
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    assert any('"mesh"' in ln for ln in lines)


def test_train_parallel_spmd_cli(tmp_path):
    """--parallel spmd trains with DP batch + TP entity-table shardings
    on the virtual mesh."""
    import train as train_mod

    run_dir = str(tmp_path / "run")
    state = train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--num_bases", "2", "--steps", "20", "--val_every", "100",
        "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain",
        "--syn_entities", "160", "--syn_triples", "400",
        "--syn_train_queries", "100", "--syn_val_queries", "20",
        "--parallel", "spmd", "--mesh", "4,2",
        "--run_dir", run_dir,
    ])
    assert state.step == 20


def test_train_gqe_cli(tmp_path):
    import train as train_mod

    run_dir = str(tmp_path / "gqe")
    state = train_mod.main([
        "--data", "synthetic", "--model", "gqe", "--decoder", "distmult",
        "--intersection", "min", "--embed_dim", "16", "--steps", "40",
        "--val_every", "1000", "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "120", "--syn_triples", "300",
        "--syn_train_queries", "120", "--syn_val_queries", "24",
        "--run_dir", run_dir,
    ])
    assert state.step == 40
    mc = json.load(open(os.path.join(run_dir, "model_config.json")))
    assert mc["decoder"] == "distmult"

    # GQE checkpoint restores through the eval CLI
    import evaluate as eval_mod
    eval_mod.main(["--run_dir", run_dir, "--n_neg", "8"])


def test_train_gqe_neighborhood_cli(tmp_path):
    """--gqe_encoder neighborhood: the fanout table threads through the
    loss, the in-loop validation, the final eval, and the eval CLI (which
    rebuilds the table deterministically from the run config)."""
    import train as train_mod

    run_dir = str(tmp_path / "gqe_nbr")
    state = train_mod.main([
        "--data", "synthetic", "--model", "gqe", "--decoder", "bilinear",
        "--intersection", "min", "--gqe_encoder", "neighborhood",
        "--gqe_aggregator", "mean", "--gqe_fanout", "4",
        "--embed_dim", "16", "--steps", "40",
        "--val_every", "20", "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "120", "--syn_triples", "300",
        "--syn_train_queries", "120", "--syn_val_queries", "24",
        "--run_dir", run_dir,
    ])
    assert state.step == 40
    assert "nbr" in state.params  # combine weights exist and were trained
    mc = json.load(open(os.path.join(run_dir, "model_config.json")))
    assert mc["encoder"] == "neighborhood"

    import evaluate as eval_mod
    eval_mod.main(["--run_dir", run_dir, "--n_neg", "8"])


def test_train_from_gqe_pickle_dir(tmp_path):
    """Full reference-format path: synthetic KG -> graph_data.pkl + query
    pickles -> train.py --data pkl:<dir>."""
    import train as train_mod
    from mpqe_tpu.data import loader as loader_mod
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg

    kg = make_random_kg(n_entities=100, n_modes=2, n_base_rels=3,
                        n_triples=400, seed=81)
    d = tmp_path / "dataset"
    d.mkdir()
    # save_graph_pickle returns the directed-rel-id map that keeps query
    # pickles consistent with the reloaded graph's relation vocabulary
    rel_map = loader_mod.save_graph_pickle(str(d / "graph_data.pkl"), kg)
    sampler = QuerySampler(kg, seed=4)
    loader_mod.save_queries_pickle(
        str(d / "train_queries_2.pkl"),
        sampler.sample_queries("2-inter", 60, n_neg=8), rel_id_map=rel_map)
    loader_mod.save_queries_pickle(
        str(d / "val_queries_2.pkl"),
        sampler.sample_queries("2-inter", 20, n_neg=8), rel_id_map=rel_map)
    # 1-chain as arity-3 file slot (loader scans both)
    loader_mod.save_queries_pickle(
        str(d / "train_queries_3.pkl"),
        sampler.sample_queries("1-chain", 60, n_neg=8), rel_id_map=rel_map)

    run_dir = str(tmp_path / "run")
    state = train_mod.main([
        "--data", f"pkl:{d}", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "30", "--val_every", "25",
        "--batch_size", "32", "--n_neg", "4", "--run_dir", run_dir,
    ])
    assert state.step == 30
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_pkl_derives_raw_edge_1chain_respecting_structures(tmp_path):
    """Without train_edges.pkl, train.py derives 1-chain training stores
    from the train graph (reference protocol) — but only when the
    --structures selection includes 1-chain."""
    import json as _json

    import train as train_mod
    from mpqe_tpu.data import loader as loader_mod
    from mpqe_tpu.data.sampler import QuerySampler, make_random_kg

    kg = make_random_kg(n_entities=80, n_modes=2, n_base_rels=3,
                        n_triples=300, seed=91)
    d = tmp_path / "dataset"
    d.mkdir()
    rel_map = loader_mod.save_graph_pickle(str(d / "graph_data.pkl"), kg)
    sampler = QuerySampler(kg, seed=7)
    loader_mod.save_queries_pickle(
        str(d / "train_queries_2.pkl"),
        sampler.sample_queries("2-inter", 40, n_neg=8), rel_id_map=rel_map)
    loader_mod.save_queries_pickle(
        str(d / "val_queries_2.pkl"),
        sampler.sample_queries("2-inter", 15, n_neg=8), rel_id_map=rel_map)

    def events(run_dir):
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            return [_json.loads(line) for line in f]

    # default structures=all -> raw-edge 1-chain derived, burn-in runs
    r1 = str(tmp_path / "run_all")
    train_mod.main([
        "--data", f"pkl:{d}", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "20", "--val_every", "100",
        "--batch_size", "32", "--n_neg", "4", "--run_dir", r1,
    ])
    ev = events(r1)
    derived = [e for e in ev if e.get("event") == "raw_edge_1chain_derived"]
    assert derived and derived[0]["edge_queries"] == 2 * kg.n_triples
    assert any(e.get("structure") == "1-chain" for e in ev if "loss" in e)

    # explicit exclusion of 1-chain -> nothing derived, no 1-chain steps
    r2 = str(tmp_path / "run_no1c")
    train_mod.main([
        "--data", f"pkl:{d}", "--structures", "2-inter",
        "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "20", "--val_every", "100",
        "--batch_size", "32", "--n_neg", "4", "--run_dir", r2,
    ])
    ev = events(r2)
    assert not any(e.get("event") == "raw_edge_1chain_derived" for e in ev)
    assert not any(e.get("structure") == "1-chain" for e in ev if "loss" in e)


def test_train_shared_negatives_cli(tmp_path):
    """--shared_negatives K trains through the batch-shared-candidates
    protocol variant (models/mpqe.py make_shared_negs_batch_loss) and
    still learns: train memorization AUC well above chance."""
    import math

    import train as train_mod

    run_dir = str(tmp_path / "run")
    state = train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "300", "--val_every", "250",
        "--batch_size", "64", "--n_neg", "4",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "300", "--syn_val_queries", "60",
        "--shared_negatives", "32", "--self_adv_tau", "1.0",
        "--run_dir", run_dir,
    ])
    assert state.step == 300
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    vals = [json.loads(ln) for ln in lines if '"val"' in ln]
    assert vals, "no validation events logged"
    assert all(math.isfinite(v["val"]["auc_macro"]) for v in vals)

    # guards: wrong model / kernel / parallel combinations refuse
    import pytest

    for extra in (["--model", "gqe"],
                  ["--kernel", "fused", "--num_bases", "4"],
                  ["--parallel", "spmd"]):
        with pytest.raises(SystemExit):
            train_mod.main([
                "--data", "synthetic", "--steps", "5",
                "--shared_negatives", "8",
                "--syn_entities", "60", "--syn_triples", "150",
                "--syn_train_queries", "40", "--syn_val_queries", "10",
                "--run_dir", str(tmp_path / "guard"),
            ] + extra)
    # --self_adv_tau without --shared_negatives refuses too
    for extra in (["--self_adv_tau", "1.0"],
                  ["--model", "gqe", "--self_adv_tau", "1.0"]):
        with pytest.raises(SystemExit):
            train_mod.main([
                "--data", "synthetic", "--steps", "5",
                "--syn_entities", "60", "--syn_triples", "150",
                "--syn_train_queries", "40", "--syn_val_queries", "10",
                "--run_dir", str(tmp_path / "guard"),
            ] + extra)


def test_train_bfloat16_cli(tmp_path):
    """--dtype bfloat16 trains end-to-end with bf16 params (the 12%-
    faster flagship-step configuration, BASELINE.md) and logs finite
    validation metrics."""
    import math

    import jax.numpy as jnp

    import train as train_mod

    run_dir = str(tmp_path / "run")
    state = train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "200", "--val_every", "150",
        "--batch_size", "64", "--n_neg", "4",
        "--structures", "1-chain",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "300", "--syn_val_queries", "60",
        "--dtype", "bfloat16",
        "--run_dir", run_dir,
    ])
    assert state.step == 200
    assert state.params["emb"]["ent"].dtype == jnp.bfloat16
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    vals = [json.loads(ln) for ln in lines if '"val"' in ln]
    assert vals and all(
        math.isfinite(v["val"]["auc_macro"]) for v in vals)


def test_train_trace_cli(tmp_path):
    """--trace N captures a jax.profiler trace window into RUN_DIR/trace
    and logs trace_start/trace_done events around it."""
    import train as train_mod

    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "40", "--val_every", "100",
        "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain",
        "--syn_entities", "120", "--syn_triples", "300",
        "--syn_train_queries", "100", "--syn_val_queries", "20",
        "--trace", "5", "--trace_skip", "10",
        "--run_dir", run_dir,
    ])
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    events = [json.loads(ln).get("event") for ln in lines]
    assert "trace_start" in events and "trace_done" in events
    start = next(json.loads(ln) for ln in lines
                 if json.loads(ln).get("event") == "trace_start")
    done = next(json.loads(ln) for ln in lines
                if json.loads(ln).get("event") == "trace_done")
    assert done["step"] - start["step"] >= 5
    trace_dir = os.path.join(run_dir, "trace")
    # the profiler wrote something under RUN_DIR/trace
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(trace_dir)
             for f in fs]
    assert found, "no trace files written"


def test_evaluate_ranking_shards_cli(tmp_path):
    """evaluate.py --ranking --shards runs the sharded full ranking on
    the virtual mesh and agrees with the dense run."""
    import json as _json

    import evaluate as eval_mod
    import train as train_mod

    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "60", "--val_every", "50",
        "--batch_size", "32", "--n_neg", "4",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "150", "--syn_val_queries", "40",
        "--run_dir", run_dir,
    ])
    import contextlib
    import io

    def ranking_lines(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eval_mod.main(argv)
        return {o["ranking"]: o for o in map(_json.loads,
                                             buf.getvalue().splitlines())
                if "ranking" in o}

    base = ["--run_dir", run_dir, "--ranking", "--hits_at", "1,5"]
    dense = ranking_lines(base)
    sharded = ranking_lines(base + ["--shards", "4"])
    assert set(sharded) == set(dense) and dense
    for s in dense:
        for metric in ("mrr", "hits@1", "hits@5"):
            assert abs(sharded[s][metric] - dense[s][metric]) < 1e-9


def test_train_optimizer_knobs_then_evaluate_and_resume(tmp_path):
    """--lr_schedule/--grad_clip/--weight_decay change the opt_state
    pytree; evaluate.py and --resume must rebuild a matching template
    from config.json (regression: a default-TrainConfig template fails
    the Orbax restore structurally)."""
    import evaluate as eval_mod
    import serve as serve_mod
    import train as train_mod

    run_dir = str(tmp_path / "run")
    argv = [
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--readout", "sum", "--steps", "60", "--val_every", "50",
        "--batch_size", "32", "--n_neg", "4",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "200", "--syn_val_queries", "40",
        "--lr_schedule", "warmup_cosine", "--warmup_steps", "10",
        "--grad_clip", "1.0", "--weight_decay", "1e-4",
        "--run_dir", run_dir,
    ]
    train_mod.main(argv)
    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["grad_clip"] == 1.0 and cfg["weight_decay"] == 1e-4

    eval_mod.main(["--run_dir", run_dir, "--n_neg", "8"])
    serve_mod.main(["--run_dir", run_dir, "--requests", "2", "--batch", "2",
                    "--structures", "1-chain"])

    # resume restores the chained/adamw opt_state and continues
    train_mod.main(argv[:-2] + ["--run_dir", run_dir, "--resume",
                                "--steps", "80"])
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read()
    assert '"step": 80' in lines


def test_train_parallel_with_optimizer_knobs(tmp_path):
    """grad_clip/adamw change the opt_state pytree; the SPMD path's
    sharding rules must stay structure-generic."""
    import train as train_mod

    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "2",
        "--num_bases", "4", "--steps", "30", "--val_every", "20",
        "--batch_size", "32", "--n_neg", "2",
        "--syn_entities", "200", "--syn_triples", "600",
        "--parallel", "spmd", "--mesh", "4,2",
        "--grad_clip", "1.0", "--weight_decay", "1e-4",
        "--lr_schedule", "warmup_cosine", "--warmup_steps", "5",
        "--run_dir", run_dir,
    ])
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_serve_bulk_answer_mode(tmp_path):
    """serve.py --answer <queries.pkl> --out <npz>: offline bulk top-k
    over a GQE-format query file (mixed structures, one process)."""
    import numpy as np

    import serve as serve_mod
    import train as train_mod
    from mpqe_tpu.data import loader as loader_mod
    from mpqe_tpu.data.sampler import QuerySampler

    run_dir = str(tmp_path / "run")
    args = [
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "2",
        "--num_bases", "2", "--steps", "60", "--val_every", "50",
        "--batch_size", "32", "--n_neg", "4",
        "--structures", "1-chain,2-inter",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "200", "--syn_val_queries", "40",
        "--run_dir", run_dir,
    ]
    train_mod.main(args)
    kg, _, _ = train_mod.load_data(train_mod.parse_args(args))
    sampler = QuerySampler(kg, seed=77)
    qs = (sampler.sample_queries("1-chain", 12, n_neg=1)
          + sampler.sample_queries("2-inter", 12, n_neg=1))
    qpkl = str(tmp_path / "queries.pkl")
    loader_mod.save_queries_pickle(qpkl, qs)

    out = str(tmp_path / "answers.npz")
    serve_mod.main(["--run_dir", run_dir, "--answer", qpkl, "--out", out,
                    "--k", "5", "--batch", "8"])
    z = np.load(out)
    assert z["entity_ids"].shape == (24, 5)
    assert z["scores"].shape == (24, 5)
    assert sorted(set(z["structure"].tolist())) == ["1-chain", "2-inter"]
    # answers respect the target mode (the server's mode mask)
    for row, s in zip(z["entity_ids"], z["structure"]):
        modes = set(kg.entity_mode[row].tolist())
        assert len(modes) == 1, (s, row)


def test_serve_bulk_answer_sharded_matches_dense(tmp_path):
    """--answer composes with --shards: row-sharded bulk answers equal
    the dense server's element-for-element."""
    import numpy as np

    import serve as serve_mod
    import train as train_mod
    from mpqe_tpu.data import loader as loader_mod
    from mpqe_tpu.data.sampler import QuerySampler

    run_dir = str(tmp_path / "run")
    args = [
        "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
        "--num_bases", "2", "--steps", "40", "--val_every", "30",
        "--batch_size", "32", "--n_neg", "2",
        "--structures", "1-chain,2-chain",
        "--syn_entities", "150", "--syn_triples", "400",
        "--syn_train_queries", "150", "--syn_val_queries", "30",
        "--run_dir", run_dir,
    ]
    train_mod.main(args)
    kg, _, _ = train_mod.load_data(train_mod.parse_args(args))
    sampler = QuerySampler(kg, seed=5)
    qs = (sampler.sample_queries("1-chain", 8, n_neg=1)
          + sampler.sample_queries("2-chain", 8, n_neg=1))
    qpkl = str(tmp_path / "q.pkl")
    loader_mod.save_queries_pickle(qpkl, qs)

    dense = str(tmp_path / "dense.npz")
    shard = str(tmp_path / "shard.npz")
    serve_mod.main(["--run_dir", run_dir, "--answer", qpkl,
                    "--out", dense, "--k", "5"])
    serve_mod.main(["--run_dir", run_dir, "--answer", qpkl,
                    "--out", shard, "--k", "5", "--shards", "4"])
    zd, zs = np.load(dense), np.load(shard)
    np.testing.assert_array_equal(zd["entity_ids"], zs["entity_ids"])
    np.testing.assert_allclose(zd["scores"], zs["scores"], atol=1e-5)
