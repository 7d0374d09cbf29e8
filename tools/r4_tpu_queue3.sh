#!/bin/bash
# Round-4 TPU task queue, part 3 — runs after r4_tpu_queue2.sh exits.
#
# 1. celeba256_inpaint: rerun the 256px driver's six denoise/inpaint tasks
#    (queue2's run died on the then-missing --measure_inpaint_sample_n CLI
#    flag; train + generate-measure already completed and are PNG-cached).
# 2. ldm_ode: LDM implant retry with --solver_type ode — the r4 sde run
#    reproduced the known sde-train/ODE-measure family mismatch (UniPC-20 is
#    ODE; reference canonical LDM is ode, README.md:91) — at 100 epochs.
# 3. ve_long: trained-VE track B at 3x the step budget (1800 epochs).
# 4. benchwarm: re-warm the bench.py compile cache as the LAST act.
set -u
cd "$(dirname "$0")/.."

QUEUE2_PID="$(cat /tmp/r4_queue2.pid 2>/dev/null || echo 0)"
while [ "$QUEUE2_PID" != 0 ] && kill -0 "$QUEUE2_PID" 2>/dev/null; do
  sleep 30
done

probe() {
  for i in $(seq 1 25); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[queue3] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[queue3] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[queue3] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[queue3] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task celeba256_inpaint 5400 python tools/r4_celeba256.py --skip_train
run_task ldm_ode 7200 python tools/parity_ldm.py --epochs 100 --solver_type ode
run_task ve_long 5400 python tools/r4_ve_tasks.py --track b --epochs 1800
VILLAN_BENCH_DEADLINE=900 run_task benchwarm2 1000 python bench.py
echo "[queue3] ALL DONE $(date -u +%H:%M:%S)" >&2
