"""Trace ONLY the raw batch-512 UNet eval (no 50-step pipeline compile) and
print the per-op device time aggregation — the cheap loop for chasing the
DDIM-50 headline (one compile, ~30 s total over the tunnel)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from villandiffusion_tpu.models import UNet2D, UNet2DConfig


def aggregate(trace_dir):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device pids: TPU core rows (tid/pid naming varies; take pids whose
    # name mentions TPU or which carry XLA op events)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0.0)
            cnt[e["name"]] += 1
    return tot, cnt, pid_names


def main():
    model = UNet2D(UNet2DConfig.ddpm_cifar10())
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    B = int(os.environ.get("B", "512"))
    x = jnp.zeros((B, 32, 32, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def f(p, xx, tt):
        return model.apply(p, xx.astype(jnp.bfloat16), tt).astype(jnp.float32).sum()

    print("compiling...", flush=True)
    with open("/tmp/eval_hlo.txt", "w") as fh:
        fh.write(f.lower(params, x, t).compile().as_text())
    float(jax.device_get(f(params, x, t)))
    # timed: chain N evals, end with a host fetch (block_until_ready is a
    # no-op over the axon tunnel)
    N = 10
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(N):
        s = f(params, x, t)
    float(jax.device_get(s))
    dt = (time.perf_counter() - t0) / N
    print(f"eval: {dt * 1e3:.2f} ms (batch {B})", flush=True)

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/evaltrace")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            s = f(params, x, t)
        float(jax.device_get(s))
    tot, cnt, pid_names = aggregate(trace_dir)
    total = sum(tot.values())
    print(f"device total: {total / 1e3:.2f} ms over 3 evals; pids={pid_names}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us / 1e3:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
