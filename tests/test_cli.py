"""CLI drivers end-to-end: train.py -> run dir -> evaluate.py."""

import json
import os

import pytest


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

    eval_mod.main(["--run_dir", run_dir, "--split", "--n_neg", "16"])


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
