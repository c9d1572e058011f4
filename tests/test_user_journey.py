"""One end-to-end reference-user journey across every major surface:

raw RDF bytes -> prepare_dataset -> train.py (pkl data, optimizer
knobs) -> evaluate.py on val AND test -> export to a torch state_dict
-> import it back -> byte-identical eval.  Each piece has its own
suite; this pins that the seams compose."""

import contextlib
import io
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mpqe_tpu.data.sampler import make_random_kg  # noqa: E402

sys.path.insert(0, "tools")


def _eval_lines(argv):
    import evaluate as eval_mod

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_mod.main(argv)
    return [json.loads(ln) for ln in buf.getvalue().splitlines()]


def test_reference_user_journey(tmp_path):
    import import_torch_checkpoint as imp_cli
    import export_torch_checkpoint as exp_cli
    import prepare_dataset
    import train as train_mod
    from tests.test_rdf import _write_nt_from_kg

    # 1. raw RDF -> prepared pickle dataset
    src = make_random_kg(n_entities=90, n_modes=2, n_base_rels=3,
                         n_triples=500, seed=23)
    nt = str(tmp_path / "kg.nt")
    _write_nt_from_kg(src, nt)
    data_dir = str(tmp_path / "data")
    prepare_dataset.main([
        "--nt", nt, "--out", data_dir,
        "--train_per_structure", "40", "--eval_per_structure", "6",
        "--n_neg", "4", "--seed", "3"])

    # 2. train with the production knobs
    run_dir = str(tmp_path / "run")
    train_mod.main([
        "--data", f"pkl:{data_dir}", "--run_dir", run_dir,
        "--embed_dim", "16", "--n_layers", "2", "--num_bases", "2",
        "--steps", "60", "--val_every", "30", "--batch_size", "32",
        "--n_neg", "2", "--seed", "1",
        "--lr_schedule", "warmup_cosine", "--warmup_steps", "10",
        "--grad_clip", "1.0"])

    # 3. evaluate on val and the reference-reported TEST split
    val = _eval_lines(["--run_dir", run_dir, "--n_neg", "4"])[0]
    test = _eval_lines(["--run_dir", run_dir, "--n_neg", "4",
                        "--use", "test"])[0]
    assert val["use"] == "val" and test["use"] == "test"
    assert np.isfinite(val["auc_macro"]) and np.isfinite(test["auc_macro"])

    # 4. export -> torch file -> import back into a fresh run dir
    pt = str(tmp_path / "model.pt")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        exp_cli.main(["--run_dir", run_dir, "--out", pt])
    run2 = str(tmp_path / "imported")
    with contextlib.redirect_stdout(io.StringIO()):
        imp_cli.main(["--ckpt", pt, "--data", f"pkl:{data_dir}",
                      "--out", run2, "--seed", "1"])

    # 5. the re-imported model scores identically on the test split
    test2 = _eval_lines(["--run_dir", run2, "--n_neg", "4",
                         "--use", "test"])[0]
    for k, v in test.items():
        if isinstance(v, float) and k in test2:
            assert abs(test2[k] - v) < 1e-9, k
