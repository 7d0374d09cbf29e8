#!/bin/bash
# Round-4 resume queue, part 2 — runs after r4_resume_queue.sh exits.
# 1. ve_bench256: re-measure the VE sampler grid at batch 256 (PC-1000 via
#    chunked dispatch, VERDICT r3 ask #6) — the capability landed in round 4
#    but the measurement was never recorded (sampler_bench.json still 3.6@64).
# 2. benchwarm: cache re-warm as the LAST act.
set -u
cd "$(dirname "$0")/.."

QUEUE_PID="$(cat /tmp/r4_resume.pid 2>/dev/null || echo 0)"
while [ "$QUEUE_PID" != 0 ] && kill -0 "$QUEUE_PID" 2>/dev/null; do
  sleep 30
done

probe() {
  for i in $(seq 1 25); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[resume2] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[resume2] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[resume2] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[resume2] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

VILLAN_BENCH_ONLY=ve run_task ve_bench256 2400 python tools/bench_samplers.py
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_q2 1000 python bench.py
echo "[resume2] ALL DONE $(date -u +%H:%M:%S)" >&2
