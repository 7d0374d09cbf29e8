#!/bin/bash
# Round-3 TPU task list — status ledger + remaining work.
# Each step is independently resumable; order matters only for cache warmth.
#
# DONE 2026-08-19 (this round):
#   1. headline bench captured: 228.26 imgs/s/chip, vs_baseline 8.24 (rc=0,
#      warm persistent cache at ~/.cache/villan_jax)
#   2. SD-512 two-term LoRA train step: 174 ms/step batch 1 (split-term path)
#   3. canonical sde model retrained (runs/parity_r3) + corrected inpaint
#      scoring measured: poisoned_denoise vs backdoor target MSE 0.0808,
#      unpoisoned_denoise vs clean MSE 0.0204 / SSIM 0.911
#
# OPERATIONAL RULE learned the hard way: the axon tunnel is effectively
# single-client — ANY concurrently-started python process that imports jax
# (even JAX_PLATFORMS=cpu: the plugin still initializes) can crash the
# active TPU worker ("TPU worker process crashed or restarted").  Run ONE
# jax process at a time; probe after any crash/kill:
set -x
cd "$(dirname "$0")/.."

timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))" || exit 1

# A. finish the DDPM-1000 generate measure on runs/parity_r3 (resumable via
#    the PNG-count cache; long 1000-step scans at batch>=512 crash the
#    tunneled worker — keep eval_max_batch at 256)
RUN="runs/parity_r3/res_None_FAKE32_ep50_sde_c1.0_p0.1_epr0.0_BOX_14-HAT_psi1.0_lr0.0002_vp1.0_ve1.0"
VILLAN_FAKE_N=50000 timeout 3600 python -m villandiffusion_tpu.cli \
    --mode measure --ckpt "$RUN" --sched DDPM-SCHED --infer_steps 1000 \
    --eval_max_batch 256

# B. LDM implant-evidence run at the real ldm-celebahq-256 architecture
#    (tools/parity_ldm.py; ~15 min: store build + 30-epoch train + measure)
timeout 3600 python tools/parity_ldm.py --n 2048 --epochs 30 --batch 16

# C. re-warm the bench compile cache as the LAST TPU act of the round so the
#    driver's BENCH_r03 capture hits a warm cache
VILLAN_BENCH_DEADLINE=900 timeout 1000 python bench.py
