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
# Stages can be skipped with RUNBOOK_BENCH=0 RUNBOOK_TRAIN=0 RUNBOOK_EVAL=0
# RUNBOOK_REFINE=0 RUNBOOK_PROFILE=0.
# PROBE_ATTEMPTS bounds the tunnel wait (default 9 ~= 3 h); exits 2 when
# exhausted. Exits non-zero if any enabled stage failed (stages keep going).
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

# Wait for a live tunnel, re-probing every ~20 min, up to PROBE_ATTEMPTS tries.
attempts=0
until probe; do
  attempts=$((attempts + 1))
  if [ "$attempts" -ge "${PROBE_ATTEMPTS:-9}" ]; then
    log "tunnel still degraded after $attempts probes; giving up"
    exit 2
  fi
  log "tunnel degraded (probe $attempts/${PROBE_ATTEMPTS:-9}); sleeping 20 min"
  sleep 1200
done
log "tunnel live"

declare -A STATUS

if [ "${RUNBOOK_BENCH:-1}" = 1 ]; then
  log "stage 1/5: bench.py (full; internal deadline watchdog applies)"
  BENCH_DEADLINE="${BENCH_DEADLINE:-5400}" \
    timeout 6000 python bench.py 2>&1 | tee "$OUT/bench.log"
  STATUS[bench]=${PIPESTATUS[0]}
  grep -h '"metric"' "$OUT/bench.log" | tail -1 > "$OUT/bench.json" || true
fi

if [ "${RUNBOOK_TRAIN:-1}" = 1 ]; then
  log "stage 2/5: sustained flagship stage-2 training (500 steps, loss curve)"
  # synthetic batches, flagship width, bf16+remat+EMA+frozen-mask — the
  # VERDICT r3 #3 sustained-training proof; metrics.jsonl IS the loss curve
  timeout 5400 python train.py \
    --config prometheus_tpu/configs/config.yaml \
    --override training.batch_size=1 \
    --stage mvldm --synthetic --max_steps 500 --log_every 5 \
    --save_every 0 --ckpt_dir "$OUT/train500" 2>&1 | tee "$OUT/train500.log"
  STATUS[train500]=${PIPESTATUS[0]}
  cp -f "$OUT/train500/metrics.jsonl" "$OUT/train500_loss_curve.jsonl" \
    2>/dev/null || true
fi

if [ "${RUNBOOK_EVAL:-1}" = 1 ]; then
  log "stage 3/5: scene_benchmark80 sweep (resumable; skips existing)"
  # eval.py computes per-prompt proxy metrics itself (default on) and writes
  # metrics.json; no separate tools/compute_metrics.py pass is needed.
  timeout 10800 python eval.py \
    --benchmark_dir benchmarks/scene_benchmark80 \
    --export_dir "$OUT/eval80" 2>&1 | tee "$OUT/eval80.log"
  STATUS[eval]=${PIPESTATUS[0]}
  if [ "${STATUS[eval]}" != 0 ]; then
    # timeout/crash mid-sweep: any metrics summary covers only the completed
    # prompts. Tag it so a truncated average isn't mistaken for the full 80.
    echo '{"partial": true, "exit_status": '"${STATUS[eval]}"'}' \
      > "$OUT/eval80.PARTIAL.json"
    log "eval sweep INCOMPLETE (exit ${STATUS[eval]}); wrote eval80.PARTIAL.json"
  fi
fi

if [ "${RUNBOOK_REFINE:-1}" = 1 ]; then
  log "stage 4/5: MV-SDS++ refine width-scaling study (flagship proof)"
  timeout 7200 python tools/refine_width_study.py \
    --out "$OUT/refine_width_study.json" 2>&1 | tee "$OUT/refine.log"
  STATUS[refine]=${PIPESTATUS[0]}
fi

if [ "${RUNBOOK_PROFILE:-1}" = 1 ]; then
  log "stage 5/5: train-step section timings"
  timeout 3600 python tools/profile_train_step.py \
    > "$OUT/train_profile.json" 2> "$OUT/profile.log"
  STATUS[profile]=$?
fi

fail=0
for stage in "${!STATUS[@]}"; do
  if [ "${STATUS[$stage]}" = 0 ]; then
    log "stage $stage: PASS"
  else
    log "stage $stage: FAIL (exit ${STATUS[$stage]})"
    fail=1
  fi
done
log "runbook complete; artifacts in $OUT"
exit $fail
