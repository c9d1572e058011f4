#!/usr/bin/env bash
# Pending on-chip measurements queued while the relay was down (late
# round 3; round-4 additions at the end).  Run when `timeout 100
# python -c "<small jit>"` succeeds again; each step is independent —
# rerun any that fail.  Record results in BASELINE.md (sections noted
# per step).
#
# Usage: bash tools/run_tpu_pending.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
steps=${*:-probe smoke oh_operand bf16_shared serve_int8 serve_http \
fused_variants fused_multi self_adv_2m strat_2m gqe_2m bench}

run() { echo "=== $* ==="; timeout 1200 "$@"; echo "=== rc=$? ==="; }

for s in $steps; do case $s in
probe)
  # relay health: must print a result within ~60 s
  run python -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
t0 = time.time()
print('TPU ok', float(f(jnp.ones((256, 256)))), round(time.time()-t0, 1), 's')"
  ;;
smoke)
  # compiled-mode Pallas parity (slow: remote compiles)
  run python tools/tpu_smoke.py
  ;;
oh_operand)
  # fused_fwd onehot_operand=True vs in-kernel expansion at the
  # flagship shape -> BASELINE.md fused whole-forward row (decide the
  # default; bit-exact parity already pinned in tests)
  run python tools/fused_fwd_bench.py --oh_operand
  ;;
bf16_shared)
  # --dtype bfloat16 x --shared_negatives 64 composition: the two
  # measured step-time levers (36.9 ms and 28.9 ms alone) on one step
  # -> BASELINE.md training rows.  MPQE_BENCH_EXTRAS prints the
  # shared-negs row; run the bf16 variant via train.py timing or
  # extend bench extras if needed.
  run python bench.py
  ;;
serve_int8)
  # quantized candidate tables at the flagship serving shape:
  # f32 vs bf16 vs int8 rank matmul (table 512/256/128 MB)
  # -> BASELINE.md serving section.  serve_bench builds a random
  # flagship model; table_dtype comes from QueryServer kwargs — run
  # three shapes via a one-off driver:
  run python - <<'EOF'
import json, sys, time
import numpy as np, jax
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.serve import QueryServer
sys.path.insert(0, "tools")
from serve_bench import random_queries  # noqa: E402
cfg = mpqe_mod.MPQEConfig(n_entities=1_000_000, n_modes=4, n_rels=266,
                          embed_dim=128, n_layers=3, num_bases=16,
                          readout="tgt")
params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
emode = np.minimum(np.arange(cfg.n_entities) // (cfg.n_entities // 4), 3
                   ).astype(np.int32)
pools = random_queries(["2-chain"], 1024, cfg.n_entities, 4, 266)
for dt in ("float32", "bfloat16", "int8"):
    srv = QueryServer(params, cfg, emode, table_dtype=dt)
    srv.warmup(["2-chain"], batch=256, k=10)
    rng = np.random.default_rng(0)
    lat = []
    for _ in range(30):
        req = [pools["2-chain"][int(i)] for i in rng.integers(0, 1024, 256)]
        t0 = time.perf_counter()
        srv.answer(req, k=10)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    print(json.dumps({"table_dtype": dt,
                      "p50_ms": float(np.percentile(lat, 50)),
                      "p95_ms": float(np.percentile(lat, 95)),
                      "queries_per_s": float(256 * len(lat) / lat.sum() * 1e3)}))
EOF
  ;;
serve_http)
  # HTTP + micro-batching over the chip: requests/s + coalescing
  run python tools/serve_bench.py --requests 20 --http_clients 8 \
      --http_batch 32
  ;;
fused_variants)
  # round 4: fold_bias / out_bf16 kernel-variant timings at the
  # flagship shape -> BASELINE.md fused whole-forward row (parity is
  # already pinned in tests; this decides whether either becomes the
  # default)
  run python tools/fused_fwd_bench.py --variants --skip_base
  ;;
fused_multi)
  # round 4: per-query-relation fused forward (fused_tgt_forward_multi)
  # vs encode_dense_multi at the eval/serve shape -> BASELINE.md
  run python tools/fused_fwd_bench.py --multi --skip_base
  ;;
self_adv_2m)
  # round 4: self-adversarial shared-candidate sweep at AM scale —
  # CPU ablation (docs/quality/quality4_hard_negs.md) showed the
  # hard-negative APR lever; this is the 2M-entity confirmation
  # -> BASELINE.md AM-scale row + docs/quality/quality4_hard_negs.md
  run python tools/am_scale_quality.py --kg band_seg \
      --edge_bank 64000000 --burn_in_steps 8000 \
      --train_shared_negs 512 --train_self_adv 1.0 --eval_oracle
  ;;
strat_2m)
  # round 4: mode-stratified shared candidates (at 2M/8 modes a
  # uniform draw is ~7/8 cross-mode) composed with self-adv — the
  # next hard-APR lever if self_adv_2m alone does not close the gap
  run python tools/am_scale_quality.py --kg band_seg \
      --edge_bank 64000000 --burn_in_steps 8000 \
      --train_shared_negs 512 --train_shared_strat \
      --train_self_adv 1.0 --eval_oracle
  ;;
gqe_2m)
  # round 4: the GQE baseline arm of the AM-scale protocol (built +
  # smoke-tested, unmeasured at 2M) -> BASELINE.md AM-scale contrast
  run python tools/am_scale_quality.py --kg band_seg --model gqe \
      --edge_bank 64000000 --burn_in_steps 8000 \
      --train_shared_negs 512 --eval_oracle
  ;;
bench)
  # headline JSON line (driver format) — also confirms nothing regressed
  run python bench.py
  ;;
*) echo "unknown step: $s";;
esac; done
