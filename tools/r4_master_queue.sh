#!/bin/bash
# Round-4 master queue (v2) — the 100-epoch LDM ode run hung inside a
# mid-run checkpoint save (futex wait, no progress for 10+ min) and was
# killed at epoch 20.  This queue redoes it as ONE clean process: 40
# epochs, checkpoints only at the end (parity_ldm --save_*_epochs 40),
# straight through train+measure+latent-score; then the remaining round-4
# evidence tasks in VERDICT-priority order.  Nothing else may run python
# on this box while a task is active (single-client tunnel, 1 CPU core).
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[master] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[master] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[master] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[master] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task ldm_ode40 9000 python tools/parity_ldm.py \
  --epochs 40 --solver_type ode --measure_sample_n 512 \
  --save_model_epochs 40 --save_image_epochs 40
run_task celeba256_full 7200 python tools/r4_celeba256.py
run_task cond_lora12k 7200 python tools/parity_cond_lora.py \
  --implant_steps 12000 --implant_lr 1e-3
VILLAN_BENCH_ONLY=ve run_task ve_bench256 2400 python tools/bench_samplers.py
run_task ve_long 5400 python tools/r4_ve_tasks.py --track b --epochs 1800
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_final 1000 python bench.py
echo "[master] ALL DONE $(date -u +%H:%M:%S)" >&2
