"""Crash-supervised training (tools/resilient_train): a run that dies
mid-training is relaunched with --resume and completes from the latest
checkpoint with the trajectory intact."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# a train.py stand-in that crashes hard the first time (after enough
# steps to checkpoint) and completes on the resumed relaunch
CRASHY = """
import json, os, sys
args = sys.argv[1:]
run_dir = args[args.index("--run_dir") + 1]
os.makedirs(run_dir, exist_ok=True)
marker = os.path.join(run_dir, "crashed_once")
resumed = "--resume" in args
if not os.path.exists(marker):
    open(marker, "w").write("1")
    open(os.path.join(run_dir, "ckpt_step"), "w").write("50")
    sys.exit(17)  # simulated TPU worker crash
assert resumed, "supervisor must relaunch with --resume"
step = int(open(os.path.join(run_dir, "ckpt_step")).read())
open(os.path.join(run_dir, "final"), "w").write(
    json.dumps({"resumed_from": step, "final": 100}))
"""


def test_supervisor_relaunches_with_resume(tmp_path):
    script = tmp_path / "crashy_train.py"
    script.write_text(CRASHY)
    run_dir = str(tmp_path / "run")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "resilient_train.py"),
         "--train_script", str(script), "--backoff", "0.01",
         "--min_uptime", "0.001", "--",
         "--run_dir", run_dir],
        cwd=REPO,
    )
    assert rc == 0
    out = json.loads(open(os.path.join(run_dir, "final")).read())
    assert out == {"resumed_from": 50, "final": 100}


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    script = tmp_path / "always_dies.py"
    script.write_text("import sys; sys.exit(3)\n")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "resilient_train.py"),
         "--train_script", str(script), "--backoff", "0.01",
         "--max_restarts", "2", "--",
         "--run_dir", str(tmp_path / "r")],
        cwd=REPO,
    )
    assert rc == 3


def test_supervisor_requires_run_dir(tmp_path):
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "resilient_train.py"),
         "--", "--steps", "10"],
        cwd=REPO,
    )
    assert rc != 0


def test_real_resume_after_kill(tmp_path):
    """End-to-end: real train.py killed mid-run resumes from its
    checkpoint and reaches the final step (CPU, tiny)."""
    run_dir = str(tmp_path / "run")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    args = ["--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
            "--readout", "sum", "--steps", "300", "--val_every", "100",
            "--batch_size", "32", "--n_neg", "2",
            "--structures", "1-chain",
            "--syn_entities", "100", "--syn_triples", "300",
            "--syn_train_queries", "200", "--syn_val_queries", "40",
            "--run_dir", run_dir]
    # phase 1: run only 100 steps (stand-in for a crash at step 100)
    rc = subprocess.call(
        [sys.executable, "train.py"] + args[:args.index("300")]
        + ["100"] + args[args.index("300") + 1:], cwd=REPO, env=env)
    assert rc == 0
    # phase 2: supervisor-style relaunch with --resume to the full 300
    rc = subprocess.call(
        [sys.executable, "train.py"] + args + ["--resume"],
        cwd=REPO, env=env)
    assert rc == 0
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    steps = [json.loads(ln).get("step", 0) for ln in lines]
    assert max(steps) >= 300
