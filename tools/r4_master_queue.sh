#!/bin/bash
# Round-4 master queue (v3) — every task now runs under tools/tpu_guard.py:
# the tunnel stalls long-lived jobs mid-run (client blocks forever on a
# device op; observed twice, once inside a checkpoint save and once in
# plain training), so each task gets a log-silence watchdog that kills the
# hung child and re-runs it; the drivers are resume-aware (LDM training
# resumes from its checkpoint, measure phases reuse their PNG caches,
# completed stages are skipped by sentinel/export checks).
# Nothing else may run python on this box while this queue is active
# (single-client tunnel, 1 CPU core).
set -u
cd "$(dirname "$0")/.."

guard_task() {
  local name="$1" stall="$2" cap="$3" retries="$4"; shift 4
  echo "[master] === $name start $(date -u +%H:%M:%S) ===" >&2
  python tools/tpu_guard.py --log "/tmp/r4q_$name.log" \
    --stall "$stall" --cap "$cap" --retries "$retries" -- "$@"
  local rc=$?
  echo "[master] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

guard_task ldm_ode40 900 9000 4 python tools/parity_ldm.py \
  --epochs 40 --solver_type ode --measure_sample_n 512 \
  --save_model_epochs 10 --save_image_epochs 40
guard_task celeba256_full 900 7200 3 python tools/r4_celeba256.py
guard_task cond_lora12k 900 7200 2 python tools/parity_cond_lora.py \
  --implant_steps 12000 --implant_lr 1e-3
VILLAN_BENCH_ONLY=ve guard_task ve_bench256 600 2400 2 python tools/bench_samplers.py
guard_task ve_long 900 5400 2 python tools/r4_ve_tasks.py --track b --epochs 1800
VILLAN_BENCH_DEADLINE=600 guard_task benchwarm_final 700 1500 2 python bench.py
echo "[master] ALL DONE $(date -u +%H:%M:%S)" >&2
