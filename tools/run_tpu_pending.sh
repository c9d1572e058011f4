#!/usr/bin/env bash
# Pending on-chip measurements (round-5 refresh).  Everything queued in
# rounds 3-4 has been measured and recorded in BASELINE.md "Measured
# (round 5)": oh_operand (slower, r3), bf16_shared composition (r4),
# fused fold_bias/out_bf16 variants + big-block sweep (r5), the
# per-query-relation multi kernel + VMEM fix (r5), int8/bf16 serving
# tables (r5), self_adv/strat 2M (r4 negative), hard-negative training
# at 2M (r5 null with mechanism), GQE bilinear 2M arm (r5), the GEMM
# floor attribution (r5), and the fused-step breakdown + touched-row
# Adam refutation (r5), and the full 7-structure mixed-curriculum
# quality at 2M/64M (macro APR 87.80 = 0.878 of ceiling, r5 —
# docs/quality/quality5_seven_2m.md).
#
# Run when `timeout 100 python -c "<small jit>"` succeeds; each step is
# independent.  Record results in BASELINE.md.
#
# Usage: bash tools/run_tpu_pending.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
steps=${*:-probe smoke bench}

run() { echo "=== $* ==="; timeout 9000 "$@"; echo "=== rc=$? ==="; }

for s in $steps; do case $s in
probe)
  # relay health: must print a result within ~60 s
  run timeout 1200 python -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
t0 = time.time()
print('TPU ok', float(f(jnp.ones((256, 256)))), round(time.time()-t0, 1), 's')"
  ;;
smoke)
  # compiled-mode Pallas parity (slow: remote compiles)
  run timeout 2400 python tools/tpu_smoke.py
  ;;
gqe_2m)
  # GQE bilinear arm of the AM-scale protocol (the r5 first run was
  # killed at step 7100/12000 by a session crash — rerun).
  # steps_per_call 100 keeps dispatches <60 s (relay hazard).
  run python tools/am_scale_quality.py --kg band_seg --model gqe \
      --edge_bank 64000000 --burn_in_steps 8000 \
      --train_shared_negs 512 --steps_per_call 100 --eval_oracle
  ;;
box_2m)
  # round 5: the Query2Box-geometry arm at 2M (box decoder, lr from
  # the 20k tuning table in BASELINE.md)
  run python tools/am_scale_quality.py --kg band_seg --model gqe \
      --gqe_decoder box --lr 0.01 --edge_bank 64000000 \
      --burn_in_steps 8000 --train_shared_negs 512 \
      --steps_per_call 100 --eval_oracle
  ;;
bibox_2m)
  # round 5: the HYBRID decoder at 2M — the decisive arm. 20k pinned
  # protocol already measured (BASELINE.md): bibox 98.62 APR / 79.29
  # hard APR beats bilinear (98.54/76.93) AND box (87.89/73.40) on
  # both axes. At 2M, bilinear holds APR 99.36 but hard collapses to
  # 54.5; box holds hard 74.05 at APR 95.03. If bibox ~= 99 APR with
  # hard >= 74 it dominates the measured frontier in one model.
  run python tools/am_scale_quality.py --kg band_seg --model gqe \
      --gqe_decoder bibox --edge_bank 64000000 \
      --burn_in_steps 8000 --train_shared_negs 512 \
      --steps_per_call 100 --eval_oracle
  ;;
bench)
  # headline JSON line (driver format) — also confirms nothing regressed
  run timeout 2400 python bench.py
  ;;
*) echo "unknown step: $s";;
esac; done
