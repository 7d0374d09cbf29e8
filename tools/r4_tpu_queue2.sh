#!/bin/bash
# Round-4 TPU task queue, part 2 — replaces the remainder of r4_tpu_queue.sh
# after the LDM measure OOMed at eval_max_batch 128 (16.02G vs 15.75G HBM):
# retry at 64 (clean 1024 PNGs are cached; only the backdoor side and the
# latent scoring remain), then the remaining round-4 tasks, bench warm last.
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 25); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[queue2] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[queue2] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[queue2] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[queue2] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task resblock2 1800 python tools/perf_resblock.py
run_task ldm2      7200 python tools/r4_ldm_finish.py --skip_resume --eval_max_batch 64
run_task celeba256 7200 python tools/r4_celeba256.py
run_task ve        7200 python tools/r4_ve_tasks.py
run_task cond_lora 7200 python tools/parity_cond_lora.py
VILLAN_BENCH_ONLY=ve run_task vebench 2400 python tools/bench_samplers.py
VILLAN_BENCH_DEADLINE=900 run_task benchwarm 1000 python bench.py
echo "[queue2] ALL DONE $(date -u +%H:%M:%S)" >&2
