#!/usr/bin/env python
"""Crash-supervised training: relaunch ``train.py --resume`` on failure.

The TPU runtime can lose a worker mid-run (observed on the relay
backend: ``UNAVAILABLE: TPU worker process crashed or restarted`` —
the in-process JAX backend cannot be rebuilt after that, so recovery
means a fresh process).  Training already checkpoints full state
(params/opt/step/rng/best-k scores; train/checkpoint.py) and
``--resume`` restarts from the latest checkpoint, so the supervisor
loop is deliberately simple:

  run train.py -> nonzero exit? -> backoff -> relaunch with --resume

Reference parity: the reference has no failure handling at all
(SURVEY.md §5 — single process, crash = lost run); this is the
TPU-native elastic-recovery layer over the same training semantics.

Usage:
  python tools/resilient_train.py [supervisor flags] -- <train.py args>
  python tools/resilient_train.py --max_restarts 5 -- \\
      --data synthetic --steps 100000 --run_dir runs/big
"""

from __future__ import annotations

import argparse
import signal
import subprocess
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        raise SystemExit("usage: resilient_train.py [flags] -- <train args>")
    split = argv.index("--")
    sup_args, train_args = argv[:split], argv[split + 1:]

    ap = argparse.ArgumentParser()
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--backoff", type=float, default=5.0,
                    help="seconds before a relaunch (doubles per "
                         "consecutive failure, capped at 8x)")
    ap.add_argument("--min_uptime", type=float, default=60.0,
                    help="a run that lasted at least this long resets "
                         "the consecutive-failure counter")
    ap.add_argument("--python", default=sys.executable)
    ap.add_argument("--train_script", default="train.py")
    args = ap.parse_args(sup_args)

    if "--run_dir" not in train_args:
        raise SystemExit("--run_dir is required in the train args "
                         "(resume needs a stable checkpoint directory)")

    # graceful preemption passes THROUGH the supervisor: forward SIGTERM
    # to the child (train.py checkpoints and exits 0) instead of dying
    # and orphaning it — and once termination was REQUESTED, never
    # relaunch, whatever the child's exit code (the child may still die
    # nonzero if the signal lands before its handler installs, e.g.
    # during imports/data loading; that is still a shutdown, not a crash)
    child = None
    stop_requested = False

    def _forward(sig, frame):
        nonlocal stop_requested
        stop_requested = True
        if child is not None and child.poll() is None:
            child.send_signal(sig)

    signal.signal(signal.SIGTERM, _forward)

    restarts, consecutive = 0, 0
    resume_args = list(train_args)
    while True:
        if stop_requested:
            print("[resilient] termination requested; not (re)launching",
                  file=sys.stderr, flush=True)
            return 0
        t0 = time.monotonic()
        cmd = [args.python, args.train_script] + resume_args
        print(f"[resilient] launching (restart {restarts}): "
              f"{' '.join(cmd)}", file=sys.stderr, flush=True)
        child = subprocess.Popen(cmd)
        # close the race: a SIGTERM landing between the loop-top check
        # and Popen saw child None/dead — it set stop_requested but had
        # nothing to forward to.  Re-check now that the child exists
        # (train.py's handler tolerates a duplicate SIGTERM).
        if stop_requested and child.poll() is None:
            child.send_signal(signal.SIGTERM)
        rc = child.wait()
        uptime = time.monotonic() - t0
        if stop_requested:
            print(f"[resilient] terminated by request (child rc={rc}); "
                  "not relaunching", file=sys.stderr, flush=True)
            return 0 if rc == 0 else rc
        if rc == 0:
            print(f"[resilient] training completed (uptime {uptime:.0f}s)",
                  file=sys.stderr, flush=True)
            return 0
        consecutive = 0 if uptime >= args.min_uptime else consecutive + 1
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[resilient] giving up after {args.max_restarts} "
                  f"restarts (last rc={rc})", file=sys.stderr, flush=True)
            return rc
        if "--resume" not in resume_args:
            resume_args = resume_args + ["--resume"]
        delay = min(args.backoff * (2 ** consecutive), args.backoff * 8)
        print(f"[resilient] rc={rc} after {uptime:.0f}s; relaunching "
              f"with --resume in {delay:.0f}s", file=sys.stderr, flush=True)
        time.sleep(delay)


if __name__ == "__main__":
    sys.exit(main())
