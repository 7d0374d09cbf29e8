#!/bin/bash
# Round-4 master queue — supersedes r4_resume_queue.sh / _b.sh (their
# wrappers were stopped; the in-flight ldm_ode python keeps running until
# its own 7200 s cap).  Waits for the LDM training process to exit, then
# runs the remaining round-4 evidence tasks in VERDICT-priority order:
#
# 1. ldm_finish: measure + latent-score the LDM ode run's last exported
#    checkpoint (--skip_resume; the 7200 s cap kills training around epoch
#    60-75 of 100 — the export is <=5 epochs stale by save_model_epochs=5).
# 2. celeba256_full: 256px train + generate-measure + six inpaint tasks.
# 3. cond_lora12k: LoRA-r4-only implant on the pretrained MID backbone, 4x
#    budget (stage-A pretrain reused from runs/parity_cond_lora/pretrain).
# 4. ve_bench256: VE sampler grid at batch 256 (chunked PC-1000).
# 5. ve_long: trained-VE track B at 3x budget.
# 6. benchwarm_final: bench compile-cache re-warm as the LAST act.
set -u
cd "$(dirname "$0")/.."

LDM_PID="${1:-0}"
while [ "$LDM_PID" != 0 ] && kill -0 "$LDM_PID" 2>/dev/null; do
  sleep 30
done

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

LDM_RUN="runs/parity_ldm/res_LDM-256-DEFAULT_CELEBA-HQ-LATENT_ep100_ode_c1.0_p0.9_epr0.0_BOX_14-HAT_psi1.0_lr0.0002_vp1.0_ve1.0"
run_task ldm_finish 5400 python tools/r4_ldm_finish.py \
  --skip_resume --run "$LDM_RUN" --measure_sample_n 512
run_task celeba256_full 7200 python tools/r4_celeba256.py
run_task cond_lora12k 7200 python tools/parity_cond_lora.py \
  --implant_steps 12000 --implant_lr 1e-3
VILLAN_BENCH_ONLY=ve run_task ve_bench256 2400 python tools/bench_samplers.py
run_task ve_long 5400 python tools/r4_ve_tasks.py --track b --epochs 1800
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_final 1000 python bench.py
echo "[master] ALL DONE $(date -u +%H:%M:%S)" >&2
