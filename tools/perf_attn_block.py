"""Fused attention-block kernel: numeric check vs the XLA composition and
in-scan timing vs the current unfused path at the CIFAR hot shape."""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.ops import attention as A

B, T, C = 512, 256, 256
GROUPS, EPS = 32, 1e-6


def make_args(dtype):
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 12)
    x = jax.random.normal(ks[0], (B, T, C), dtype)
    gamma = jax.random.normal(ks[1], (C,), dtype) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (C,), dtype) * 0.1
    w = lambda i: jax.random.normal(ks[i], (C, C), dtype) * (C ** -0.5)
    b = lambda i: jax.random.normal(ks[i], (C,), dtype) * 0.01
    return (x, gamma, beta, w(3), b(4), w(5), b(6), w(7), b(8), w(9), b(10))


def main():
    args = make_args(jnp.bfloat16)
    ref = A.attention_block_ref(*args, GROUPS, EPS, 1, 1.0)
    got = A._attention_block_fused(*args, GROUPS, EPS, 1, 1.0)
    err = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
    ref_mag = float(jnp.abs(ref.astype(jnp.float32)).max())
    print(f"max |fused - ref| = {err:.5f}  (ref magnitude {ref_mag:.2f})")

    def bench(fn, tag, n=50):
        @jax.jit
        def loop(x, rest):
            def body(c, _):
                return fn(c, *rest), ()

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out.astype(jnp.float32).sum()

        rest = args[1:]
        float(jax.device_get(loop(args[0], rest)))
        t0 = time.perf_counter()
        float(jax.device_get(loop(args[0], rest)))
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt*1e3:.3f} ms/block")
        return dt

    fused = functools.partial(
        lambda x, *rest: A._attention_block_fused(x, *rest, GROUPS, EPS, 1, 1.0)
    )
    unfused = lambda x, *rest: A.attention_block_ref(x, *rest, GROUPS, EPS, 1, 1.0)
    d_ref = bench(unfused, "unfused (GN+4 GEMM+packed kernel)")
    d_fused = bench(fused, "fused block kernel")
    print(f"speedup: {d_ref/d_fused:.2f}x")


if __name__ == "__main__":
    main()
