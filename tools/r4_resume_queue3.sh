#!/bin/bash
# Round-4 resume queue, part 3 — runs after r4_resume_queue2.sh exits.
# The VM reset dropped all run-dir weights (gitignored), so the 256px
# inpaint rerun needs a fresh 4-epoch train first (~8 min train at the
# measured 115.5 s/epoch + generate-measure + the six inpaint tasks).
set -u
cd "$(dirname "$0")/.."

QUEUE_PID="$(cat /tmp/r4_resume2.pid 2>/dev/null || echo 0)"
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
    echo "[resume3] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[resume3] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[resume3] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[resume3] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task celeba256_full 7200 python tools/r4_celeba256.py
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_q3 1000 python bench.py
echo "[resume3] ALL DONE $(date -u +%H:%M:%S)" >&2
