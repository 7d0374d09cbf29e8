#!/bin/bash
# Round-3 TPU task list — run once the axon tunnel is back.
# Each step is independently resumable; order matters only for cache warmth.
set -x
cd "$(dirname "$0")/.."

# 0. probe (bounded): a wedged tunnel hangs forever on the first device op
timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok:', float((x@x).sum()))" || exit 1

# 1. headline bench — warms the persistent compile cache for the driver's
#    end-of-round BENCH capture (VERDICT r2 item 1)
VILLAN_BENCH_DEADLINE=900 timeout 1000 python bench.py

# 2. SD-512 two-term LoRA train step via the split-term path
#    (VERDICT r2 item 6; the monolithic graph 413s on the tunnel)
VILLAN_SD_TERMS=2 VILLAN_SD_SPLIT=1 VILLAN_SD_BATCHES=1 \
    timeout 3600 python tools/bench_sd_train.py

# 3. poisoned_denoise inpaint re-measure under the corrected comparison
#    target (BASELINE.md note; needs the sde-trained canonical model)
# timeout 3600 python -m villandiffusion_tpu.cli --mode measure \
#     --ckpt runs/parity/res_* --task poisoned_denoise \
#     --sched UNIPC-SCHED --infer_steps 20 --infer_start 10
