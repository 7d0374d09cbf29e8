#!/bin/bash
# Round-4 TPU task queue — serialized (the axon tunnel is single-client;
# see .claude/skills/verify/SKILL.md).  Each task runs in its own process;
# between tasks we probe the tunnel with a KILLABLE subprocess in a retry
# loop because a wedged tunnel HANGS the first device op rather than
# raising, and the wedge clears on the order of minutes.
#
# Tasks (VERDICT r3 asks):
#   ldm        #2 finish the LDM implant protocol (measure + latent scores)
#   resblock   #7 fused whole-res-block kernel vs XLA at the hot shapes
#   celeba256  #3 end-to-end 256px pixel run (train+measure+6 inpaint tasks)
#   ve         #5 VE implant evidence (analytic product-path + trained tiny)
#   cond_lora  #8 LoRA-only implant on a pretrained backbone (MID stack)
#   benchwarm  #1 re-warm the bench compile cache as the LAST TPU act
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 25); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))"; then
      return 0
    fi
    echo "[queue] probe attempt $i failed; sleeping 45s" >&2
    sleep 45
  done
  return 1
}

run_task() {
  local name="$1" cap="$2"; shift 2
  echo "[queue] === $name start $(date -u +%H:%M:%S) ===" >&2
  if ! probe; then echo "[queue] $name SKIPPED: tunnel never came up" >&2; return 1; fi
  timeout "$cap" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "[queue] === $name done rc=$rc $(date -u +%H:%M:%S) ===" >&2
  tail -3 "/tmp/r4q_$name.log" >&2
  return $rc
}

run_task ldm       7200 python tools/r4_ldm_finish.py --skip_resume
run_task resblock  1800 python tools/perf_resblock.py
run_task celeba256 7200 python tools/r4_celeba256.py
run_task ve        7200 python tools/r4_ve_tasks.py
run_task cond_lora 7200 python tools/parity_cond_lora.py
VILLAN_BENCH_DEADLINE=900 run_task benchwarm 1000 python bench.py
echo "[queue] ALL DONE $(date -u +%H:%M:%S)" >&2
