#!/bin/bash
# Round-4 resume queue B — replaces r4_resume_queue2/3.sh (their wait-loop
# wrappers were stopped before starting any TPU work) with the right
# priority order after r4_resume_queue.sh finishes:
# 1. celeba256_full: fresh 4-epoch 256px train (weights were lost to the VM
#    reset) + generate-measure + the six UniPC-20/start-10 inpaint tasks —
#    VERDICT r3 ask #3.
# 2. ve_bench256: the VE sampler grid at batch 256 (PC-1000 via chunked
#    dispatch) — VERDICT r3 ask #6's unrecorded measurement.
# 3. benchwarm: cache re-warm as the LAST act.
set -u
cd "$(dirname "$0")/.."

QUEUE_PID="$(cat /tmp/r4_resume.pid 2>/dev/null || echo 0)"
while [ "$QUEUE_PID" != 0 ] && kill -0 "$QUEUE_PID" 2>/dev/null; do
  sleep 30
done

probe() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[resumeB] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[resumeB] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[resumeB] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[resumeB] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task celeba256_full 7200 python tools/r4_celeba256.py
VILLAN_BENCH_ONLY=ve run_task ve_bench256 2400 python tools/bench_samplers.py
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_qb 1000 python bench.py
echo "[resumeB] ALL DONE $(date -u +%H:%M:%S)" >&2
