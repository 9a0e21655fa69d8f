#!/usr/bin/env bash
# TPU runbook: the chip-gated measurement sequence, in priority order,
# resumable across tunnel outages.
#
# The tunneled axon backend has hours-long degraded phases (CLAUDE.md
# "Environment gotchas") where even a toy jit takes minutes. This script
# probes first and, on a live tunnel, runs the stages one at a time --
# NEVER two TPU processes at once (HBM + remote-compile contention).
# Each stage is independently resumable: bench emits a partial artifact on
# its internal deadline, eval.py skips prompts whose exports already exist.
#
# Usage:  bash tools/tpu_runbook.sh [out_dir]   (default /tmp/tpu_runbook)
# Stages can be skipped with RUNBOOK_BENCH=0 RUNBOOK_EVAL=0 RUNBOOK_PROFILE=0.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_runbook}"
mkdir -p "$OUT"

log() { echo "[runbook $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 420 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
y = jax.jit(lambda a: a @ a)(jnp.ones((1024, 1024)))
jax.device_get(y.ravel()[0:1])
print(f"probe {time.time()-t0:.1f}s", flush=True)
EOF
}

# Wait (up to ~3 h) for a live tunnel, re-probing every ~20 min.
until probe; do
  log "tunnel degraded; sleeping 20 min before re-probe"
  sleep 1200
done
log "tunnel live"

if [ "${RUNBOOK_BENCH:-1}" = 1 ]; then
  log "stage 1/3: bench.py (full; internal deadline watchdog applies)"
  BENCH_DEADLINE="${BENCH_DEADLINE:-5400}" \
    timeout 6000 python bench.py 2>&1 | tee "$OUT/bench.log"
  grep -h '"metric"' "$OUT/bench.log" | tail -1 > "$OUT/bench.json" || true
fi

if [ "${RUNBOOK_EVAL:-1}" = 1 ]; then
  log "stage 2/3: scene_benchmark80 sweep (resumable; skips existing)"
  timeout 10800 python eval.py \
    --benchmark_dir benchmarks/scene_benchmark80 \
    --export_dir "$OUT/eval80" --compute_metrics 2>&1 | tee "$OUT/eval80.log"
  # writes <input_dir>/all_metric.json; last stdout line is the summary JSON
  python tools/compute_metrics.py --input_dir "$OUT/eval80" 2>> "$OUT/eval80.log" \
    | tail -1 > "$OUT/eval80_metrics.json" || true
fi

if [ "${RUNBOOK_PROFILE:-1}" = 1 ]; then
  log "stage 3/3: train-step section timings"
  timeout 3600 python tools/profile_train_step.py \
    > "$OUT/train_profile.json" 2> "$OUT/profile.log" || true
fi

log "runbook complete; artifacts in $OUT"
