#!/bin/bash
# Round-4 resume queue — the VM reset killed r4_tpu_queue3/4 before they ran
# and wiped the JAX compile cache (~/.cache/villan_jax empty), so this single
# queue re-runs everything still outstanding, in VERDICT-priority order:
#
# 1. benchwarm_first: re-warm bench.py's compile cache IMMEDIATELY — the
#    driver-captured bench number is round 3's top ask and a cold cache is
#    the one failure mode bench.py cannot absorb inside its 450 s deadline.
# 2. celeba256_inpaint: the six 256px denoise/inpaint tasks (train +
#    generate-measure already done in runs/parity_256, PNG-cached).
# 3. ldm_ode: LDM implant retry, canonical --solver_type ode (README.md:91),
#    100 epochs — the r4 sde run reproduced the known sde-train/ODE-measure
#    family mismatch.
# 4. cond_lora12k: LoRA-r4-only implant on the pretrained MID backbone at 4x
#    steps / lr 1e-3 (stage-A pretrain reused from runs/parity_cond_lora).
# 5. ve_long: trained-VE track B at 3x budget (1800 epochs).
# 6. benchwarm_final: cache re-warm as the LAST act.
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[resume] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[resume] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[resume] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[resume] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

VILLAN_BENCH_DEADLINE=1200 run_task benchwarm_first 1300 python bench.py
run_task celeba256_inpaint 5400 python tools/r4_celeba256.py --skip_train
run_task ldm_ode 7200 python tools/parity_ldm.py --epochs 100 --solver_type ode
run_task cond_lora12k 7200 python tools/parity_cond_lora.py \
  --implant_steps 12000 --implant_lr 1e-3
run_task ve_long 5400 python tools/r4_ve_tasks.py --track b --epochs 1800
VILLAN_BENCH_DEADLINE=900 run_task benchwarm_final 1000 python bench.py
echo "[resume] ALL DONE $(date -u +%H:%M:%S)" >&2
