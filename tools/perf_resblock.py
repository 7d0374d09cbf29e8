"""Measure the fused res-block Pallas kernel vs XLA at the hot shapes.

VERDICT r3 ask #7: the speed-of-light audit (BASELINE.md) found identical-
shape 3x3 convs run 144-151 TF/s inside XLA's multi-output GN-stat fusions
vs 178 TF/s clean, leaving the headline ~18% under the fusion-level
ceiling.  This probes whether a whole-res-block Pallas kernel (ONE HBM
round-trip for GN1+SiLU+conv1+temb+GN2+SiLU+conv2+shortcut; all stats
VMEM-resident — ops/fused_conv.py::resblock_fused) beats the XLA chain
in-scan at the dominant shapes:

  - B=512, 16x16, C=256 -> 256  (67.5% of DDIM eval device time)
  - B=512, 32x32, C=128 -> 128  (the other big res-block population)

Method: `lax.scan` of STEPS chained applications (output feeds input, so
nothing is dead-code-eliminated and dispatch overhead amortizes), timed
after a warmup run, TF/s = 2*B*HW*Cout*C*18(+1)/t.  Correctness: max|diff|
vs the XLA chain on the same inputs.

Usage: python tools/perf_resblock.py [--steps 50] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from villandiffusion_tpu.ops import fused_conv as FC
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()

    SHAPES = [
        (args.batch, 16, 16, 256, 256, 32),
        (args.batch, 32, 32, 128, 128, 32),
    ]
    results = {}

    for (B, H, W, C, Cout, groups) in SHAPES:
        key = f"B{B}_{H}x{W}_C{C}"
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        t = jnp.asarray(rng.standard_normal((B, Cout)), jnp.bfloat16)
        s1 = jnp.asarray(rng.standard_normal(C), jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(C), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.05, jnp.float32)
        c1b = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        s2 = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, Cout, Cout)) * 0.05, jnp.float32)
        c2b = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        eps = 1e-5

        def xla_fn(xx):
            return FC.xla_resblock(xx, t, s1, b1, w1, c1b, s2, b2, w2, c2b,
                                   None, None, groups, eps, 1.0)

        def pallas_fn(xx):
            return FC._pallas_resblock(xx, t, s1, b1, w1, c1b, s2, b2, w2,
                                       c2b, None, None, groups, eps, 1.0)

        # correctness first
        ref = np.asarray(xla_fn(x), np.float32)
        got = np.asarray(pallas_fn(x), np.float32)
        scale = float(np.abs(ref).mean())
        err = float(np.abs(ref - got).max())
        print(f"[{key}] max|diff| {err:.4e} (|ref| mean {scale:.3f})",
              flush=True)

        flops_per = 2 * B * H * W * Cout * C * 18

        def bench(fn, label):
            def step(carry, _):
                # GN1 renormalizes the carry at every application, so chained
                # blocks stay bounded (residual adds grow ~linearly, far from
                # bf16 range) — no extra normalization op to pollute timing
                return fn(carry).astype(carry.dtype), ()

            @jax.jit
            def run(x0):
                y, _ = jax.lax.scan(step, x0, None, length=args.steps)
                return y

            run(x).block_until_ready()  # compile + warm
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run(x).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            tfs = flops_per * args.steps / best / 1e12
            ms = best / args.steps * 1e3
            print(f"[{key}] {label:8s} {ms:7.3f} ms/block  {tfs:6.1f} TF/s",
                  flush=True)
            return {"ms_per_block": ms, "tf_s": tfs}

        results[key] = {
            "xla": bench(xla_fn, "xla"),
            "pallas": bench(pallas_fn, "pallas"),
            "max_abs_diff": err,
        }

    print(json.dumps(results, indent=2))
    with open("/tmp/perf_resblock.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
