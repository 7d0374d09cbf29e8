"""Sampler-sweep throughput on the real chip: every reference solver at its
recommended step count (README.md:60 — 50 for DDPM/DDIM/PNDM/HEUN/LMSD, 20
for the multistep family), CIFAR10-32 UNet, batch 512, bf16, pipelined
dispatch (see BASELINE.md / memory: the axon host link requires overlapping
fetches with compute).

Writes a markdown table to stdout and JSON to sweep_logs/sampler_bench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu import factory as F
from villandiffusion_tpu.core import schedules as S

BATCH = 512
VP_GRID = [
    ("DDPM-SCHED", 50),
    ("DDIM-SCHED", 50),
    ("PNDM-SCHED", 50),
    ("HEUN-SCHED", 50),
    ("LMSD-SCHED", 50),
    ("DPM_SOLVER_PP_O1-SCHED", 20),
    ("DPM_SOLVER_O1-SCHED", 20),
    ("DPM_SOLVER_PP_O2-SCHED", 20),
    ("DPM_SOLVER_O2-SCHED", 20),
    ("DPM_SOLVER_PP_O3-SCHED", 20),
    ("DPM_SOLVER_O3-SCHED", 20),
    ("UNIPC-SCHED", 20),
    ("DEIS-SCHED", 20),
]
# VE: batch per solver — a 1000-step score-SDE PC scan (2000 NCSN++ evals)
# at batch >=256 is a single multi-minute device dispatch, which the tunnel
# drops; VILLAN_SCAN_CHUNK splits it into sub-minute segments (bit-identical
# to the monolithic scan), so the PC ladder now benches at a real batch size
# instead of shrinking the batch (VERDICT r3 ask #6).
VE_GRID = [
    ("SCORE-SDE-VE-SCHED", 1000, 256),
    ("EDM-VE-SCHED", 20, 256),
    ("EDM-VE-SDE-SCHED", 20, 256),
    ("EDM-VE-ODE-SCHED", 20, 256),
]


def bench_pipe(pipe, steps, n_rep=3, batch=BATCH):
    pipe(batch_size=batch, num_inference_steps=steps,
         rng=jax.random.PRNGKey(0), output_type="uint8")
    t0 = time.perf_counter()
    pending = [
        pipe(batch_size=batch, num_inference_steps=steps,
             rng=jax.random.PRNGKey(i), output_type="uint8", host=False).images
        for i in range(n_rep)
    ]
    for p in pending:
        np.asarray(p)
    dt = (time.perf_counter() - t0) / n_rep
    return batch / dt


def main():
    results = {}
    only = os.environ.get("VILLAN_BENCH_ONLY", "")  # "vp" | "ve" | ""

    vp = F.get_model_sched(
        image_size=32, channels=3, ckpt="DDPM-CIFAR10-DEFAULT",
        sde_type=S.SDE_VP,
    )
    for name, steps in VP_GRID if only != "ve" else []:
        pipe = vp.make_pipeline(sched_name=name, compute_dtype=jnp.bfloat16)
        ips = bench_pipe(pipe, steps)
        results[f"{name}-{steps}"] = round(ips, 1)
        print(f"| {name} | {steps} | {ips:.1f} |", flush=True)

    ve = F.get_model_sched(
        image_size=32, channels=3, ckpt="NCSNPP-32-DEFAULT",
        sde_type=S.SDE_VE,
    )
    # chunked dispatch keeps every on-device segment sub-minute at batch 256
    os.environ.setdefault("VILLAN_SCAN_CHUNK", "100")
    for name, steps, batch in VE_GRID if only != "vp" else []:
        pipe = ve.make_pipeline(sched_name=name, compute_dtype=jnp.bfloat16)
        ips = bench_pipe(pipe, steps, n_rep=1 if steps >= 1000 else 3,
                         batch=batch)
        results[f"{name}-{steps}"] = round(ips, 1)
        print(f"| {name} | {steps} | {ips:.1f} |", flush=True)

    path = "sweep_logs/sampler_bench.json"
    if os.path.exists(path):
        with open(path) as f:
            results = {**json.load(f), **results}
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
