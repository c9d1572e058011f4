"""Graceful preemption: SIGTERM -> checkpoint -> exit 0 -> --resume.

The production failure-recovery pair: tools/resilient_train.py
relaunches on CRASH (nonzero rc); SIGTERM is a scheduled preemption —
train.py stops at the next step boundary, saves its final checkpoint,
and exits 0 so the supervisor does NOT relaunch."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

ARGS = [
    "--data", "synthetic", "--embed_dim", "16", "--n_layers", "1",
    "--readout", "sum", "--val_every", "1000000",
    "--batch_size", "32", "--n_neg", "2", "--structures", "1-chain",
    "--syn_entities", "120", "--syn_triples", "300",
    "--syn_train_queries", "100", "--syn_val_queries", "20",
]


def _wait_for_loss_line(metrics_path, proc, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"train.py exited early rc={proc.returncode}")
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                if any('"loss"' in ln for ln in f):
                    return
        time.sleep(0.3)
    raise AssertionError("training never produced a loss line")


def test_sigterm_checkpoints_and_resumes(tmp_path):
    run_dir = str(tmp_path / "run")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "train.py", *ARGS, "--steps", "1000000",
         "--run_dir", run_dir],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    try:
        _wait_for_loss_line(metrics_path, proc)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, "graceful preemption must exit 0 (no supervisor relaunch)"

    lines = [json.loads(ln) for ln in open(metrics_path)]
    events = [ln.get("event") for ln in lines]
    assert "preempt_stop" in events
    assert "final_checkpoint" in events
    stop_step = next(ln["step"] for ln in lines
                     if ln.get("event") == "preempt_stop")
    assert stop_step > 0

    # the preempted run resumes in-process and continues PAST the stop
    import train as train_mod

    train_mod.main([*ARGS, "--steps", "20", "--resume",
                    "--run_dir", run_dir])
    lines = [json.loads(ln) for ln in open(metrics_path)]
    final_steps = [ln["step"] for ln in lines if "final" in ln]
    assert final_steps and final_steps[-1] >= stop_step + 20


def test_in_process_main_does_not_hijack_sigterm(tmp_path):
    """main() only installs the handler on the main thread and restores
    the previous one afterwards (pytest's own handler must survive)."""
    import train as train_mod

    before = signal.getsignal(signal.SIGTERM)
    train_mod.main([*ARGS, "--steps", "10",
                    "--run_dir", str(tmp_path / "run2")])
    assert signal.getsignal(signal.SIGTERM) is before


def test_supervisor_forwards_sigterm_and_does_not_relaunch(tmp_path):
    """SIGTERM to tools/resilient_train.py reaches the child, which
    checkpoints and exits 0; the supervisor exits 0 WITHOUT relaunching
    (a forwarded termination is a shutdown, never a crash)."""
    run_dir = str(tmp_path / "run")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "tools/resilient_train.py", "--backoff", "0.2",
         "--", *ARGS, "--steps", "1000000", "--run_dir", run_dir],
        env=env, cwd=root,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    try:
        _wait_for_loss_line(metrics_path, proc)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        stderr = proc.stderr.read()
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, stderr
    assert "terminated by request" in stderr or \
        "termination requested" in stderr
    # exactly one launch, zero relaunches ("relaunching with --resume")
    assert stderr.count("[resilient] launching") == 1, stderr
    assert "relaunching with --resume" not in stderr, stderr
    lines = [json.loads(ln) for ln in open(metrics_path)]
    events = [ln.get("event") for ln in lines]
    assert "preempt_stop" in events and "final_checkpoint" in events
