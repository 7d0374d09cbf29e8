#!/bin/bash
# Round-4 TPU task queue, part 4 — runs after r4_tpu_queue3.sh exits.
#
# 1. cond_lora12k: LoRA-r4-only implant on the pretrained MID backbone at 4x
#    the step budget and a LoRA-appropriate lr (the 3000-step lr-2e-4 run
#    moved contrast only to 1.35x / 0% success; the reference trains its
#    LoRA implant for 50k steps, README.md:112).  Stage-A pretrain is reused.
# 2. benchwarm: re-warm the bench.py compile cache as the LAST act.
set -u
cd "$(dirname "$0")/.."

QUEUE3_PID="$(cat /tmp/r4_queue3.pid 2>/dev/null || echo 0)"
while [ "$QUEUE3_PID" != 0 ] && kill -0 "$QUEUE3_PID" 2>/dev/null; do
  sleep 30
done

probe() {
  for i in $(seq 1 25); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[queue4] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[queue4] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[queue4] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[queue4] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task cond_lora12k 7200 python tools/parity_cond_lora.py \
  --implant_steps 12000 --implant_lr 1e-3
VILLAN_BENCH_DEADLINE=900 run_task benchwarm3 1000 python bench.py
echo "[queue4] ALL DONE $(date -u +%H:%M:%S)" >&2
