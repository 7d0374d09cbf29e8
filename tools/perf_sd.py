"""Profile the SD-512 conditional UNet eval (CFG batch) on the real chip:
capture a jax.profiler trace of a few evals and aggregate device-lane op
times, bucketed by op kind (conv / attention / other), to find where the
conditional path loses MXU utilization vs the 256px unconditional UNet.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
)

B = 8


def main():
    cfg = UNet2DConditionConfig.sd_v1()
    model = UNet2DCondition(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    x = jnp.zeros((2 * B, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2 * B,), jnp.int32)
    emb = jnp.zeros((2 * B, 77, 768), jnp.bfloat16)

    @jax.jit
    def f(p, xx, tt, ee):
        return model.apply(p, xx, tt, ee).astype(jnp.float32).sum()

    float(jax.device_get(f(params, x, t, emb)))  # compile
    import time

    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        s = f(params, x, t, emb)
    v = float(jax.device_get(s))
    dt = (time.perf_counter() - t0) / n
    print(f"CFG eval (2x{B}): {dt*1000:.1f} ms")

    with jax.profiler.trace("/tmp/sdtrace"):
        for _ in range(3):
            s = f(params, x, t, emb)
        float(jax.device_get(s))

    # aggregate device events
    paths = sorted(
        glob.glob("/tmp/sdtrace/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # find device pids (TPU lanes)
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6 / 3  # us -> s, 3 reps
            agg[name] += dur
            total += dur
    buckets = defaultdict(float)
    for name, dur in agg.items():
        low = name.lower()
        if "conv" in low:
            buckets["conv"] += dur
        elif "dot" in low or "attention" in low or "softmax" in low:
            buckets["matmul/attn"] += dur
        elif "fusion" in low:
            buckets["fusion(other)"] += dur
        else:
            buckets["other"] += dur
    print(f"device total/eval: {total*1000:.1f} ms")
    for k, v_ in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v_*1000:8.2f} ms  {100*v_/max(total,1e-12):5.1f}%")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:15]
    for name, dur in top:
        print(f"    {dur*1000:7.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
