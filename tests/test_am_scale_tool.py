"""Pin the AM-scale quality protocol tool (tools/am_scale_quality.py) —
the driver's north-star-metric harness (BASELINE.json "3-chain_inter
APR on AM") — at a miniature scale: it must run end-to-end on CPU for
every lever combination and emit a well-formed result line with the
oracle fields.

The tool is subprocess-driven (it pins its backend via
pin_platform_from_env at import time) exactly as a user runs it.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(ROOT, "tools", "am_scale_quality.py")

BASE = [
    sys.executable, TOOL, "--kg", "band_seg", "--entities", "4000",
    "--edge_bank", "50000", "--batch_size", "128",
    "--burn_in_steps", "60", "--steps", "120", "--steps_per_call", "60",
    "--train_queries", "8000", "--val_queries", "256",
    "--n_neg_eval", "16", "--n_hard_eval", "8", "--eval_oracle",
]


def run_tool(extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(BASE + extra, capture_output=True, text=True,
                         env=env, timeout=900, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    phases = [ln["phase"] for ln in lines]
    assert phases[0] == "kg_gen" and phases[-1] == "result"
    return lines[-1]


@pytest.mark.parametrize("extra,label", [
    ([], "per-query negatives only"),
    (["--train_shared_negs", "64"], "uniform shared sweep"),
    (["--train_shared_negs", "64", "--train_self_adv", "1.0",
      "--train_shared_strat"], "stratified + self-adv sweep"),
    (["--model", "gqe", "--train_shared_negs", "64"], "gqe arm"),
])
def test_am_scale_protocol_runs(extra, label):
    res = run_tool(extra)
    assert res["kg"] == "band_seg"
    assert res["val_heldout"] > 0
    assert np.isfinite(res["apr"]) and 0.0 <= res["apr"] <= 100.0
    assert np.isfinite(res["auc_pooled"])
    # oracle fields: measured ceiling + strict-subset hard negatives
    assert 0.0 < res["apr_ceiling"] <= 100.0
    assert res["mean_answer_set"] >= 1.0
    assert res["hard_queries"] > 0
    assert np.isfinite(res["hard_apr"])


def test_am_scale_guard_gqe_softand():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        BASE + ["--model", "gqe", "--train_shared_negs", "8"],
        capture_output=True, text=True, env=env, timeout=900, cwd=ROOT)
    # plain gqe (no SoftAnd) accepts the sweep — sanity that the guard
    # does NOT fire for the default decoder
    assert out.returncode == 0, out.stderr[-2000:]


def test_am_scale_hard_negatives_arm():
    # round 5: sampled strict-subset hard negatives in TRAINING
    # (--train_hard_negs) — the lever round 4 proved necessary
    # (docs/quality/quality4_hard_negs.md); pins the hard-bank build
    # (fork-parallel oracle), the -1-pad masking, and the curriculum
    # gate end-to-end
    res = run_tool(["--train_shared_negs", "64", "--train_hard_negs",
                    "4", "--hard_bank", "2048", "--hard_margin", "0.2",
                    "--hard_start", "0.25"])
    assert np.isfinite(res["apr"]) and np.isfinite(res["hard_apr"])
    assert res["hard_queries"] > 0


def test_am_scale_multi_structure_mix():
    # round 5: mixed-structure protocol (--structure list / "all"):
    # round-robin full phase, per-structure oracle eval, macro summary
    res = run_tool(["--structure", "2-chain,2-inter",
                    "--train_shared_negs", "64", "--train_hard_negs",
                    "4", "--hard_bank", "1024", "--hard_margin", "0.2"])
    ps = res["per_structure"]
    assert set(ps) == {"2-chain", "2-inter"}
    for s, r in ps.items():
        assert np.isfinite(r["apr"]) and 0.0 <= r["apr"] <= 100.0
        assert 0.0 < r["apr_ceiling"] <= 100.0
    # chains have no strict-subset satisfiers; intersections do
    assert ps["2-chain"]["hard_queries"] == 0
    assert ps["2-inter"]["hard_queries"] > 0
    assert np.isfinite(res["apr"])  # macro
    assert res["hard_apr"] is not None


def test_am_scale_structure_weights():
    # round 5: weighted mixed curriculum (--structure_weights) — the
    # chain-upweighting lever; the run must complete with a weighted
    # dispatch schedule and still eval every structure
    res = run_tool(["--structure", "2-chain,2-inter",
                    "--train_shared_negs", "64",
                    "--structure_weights", "2-chain=3"])
    assert set(res["per_structure"]) == {"2-chain", "2-inter"}
    assert np.isfinite(res["apr"])


def test_am_scale_structure_weights_unknown_rejected():
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        BASE + ["--structure", "2-chain",
                "--structure_weights", "definitely-not-a-structure=2"],
        capture_output=True, text=True, env=env, timeout=900, cwd=ROOT)
    assert out.returncode != 0
    assert "not in the trained structure set" in (out.stderr + out.stdout)
