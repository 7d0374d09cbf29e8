"""Experiment: packed-attention matmul dtype + fused-qkv variants at the
CIFAR hot shape (B=512, T=256, C=256, n_heads=1).  Timings end with a host
fetch (block_until_ready is a no-op over the axon tunnel)."""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.ops.attention import _pallas_attention_packed, _packing_factor

B, T, C = 512, 256, 256
N_HEADS = 1


@functools.partial(jax.jit, static_argnums=(3,))
def packed_bf16(q, k, v, n_heads):
    """Same packed kernel but bf16 MXU matmuls (f32 softmax)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = q.shape
    hd = C // n_heads
    scale = 1.0 / np.sqrt(hd)
    BH = B * n_heads
    G = _packing_factor(BH, T, hd, jnp.dtype(q.dtype).itemsize)

    def split(x):
        return x.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3).reshape(BH, T, hd)

    qh, kh, vh = split(q), split(k), split(v)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[...]
        kb = k_ref[...]
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[...] = jax.lax.dot_general(
            p.astype(q_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(BH // G,),
        in_specs=[
            pl.BlockSpec((G, T, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, T, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
    )(qh, kh, vh)
    return out.reshape(B, n_heads, T, hd).transpose(0, 2, 1, 3).reshape(B, T, C)


def bench(fn, *args, n=50, tag=""):
    """Chain n kernel calls inside ONE jit (per-dispatch tunnel overhead is
    ~2 ms, 5x the kernel) and divide."""

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(c, k, v, N_HEADS)
            return o, ()

        out, _ = jax.lax.scan(body, q, None, length=n)
        return out.astype(jnp.float32).sum()

    float(jax.device_get(loop(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(loop(*args)))
    dt = (time.perf_counter() - t0) / n
    gf = 2 * 2 * B * T * T * C / 1e9
    print(f"{tag}: {dt*1e3:.3f} ms  {gf/dt/1e3:.1f} TF/s")
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (B, T, C), jnp.bfloat16)
        for i in range(3)
    )
    d_f32 = bench(_pallas_attention_packed, q, k, v, tag="packed fp32-mxu")
    d_bf16 = bench(packed_bf16, q, k, v, tag="packed bf16-mxu")
    # numeric check vs XLA reference
    from villandiffusion_tpu.ops.attention import xla_attention

    ref = xla_attention(q, k, v, N_HEADS)
    got = packed_bf16(q, k, v, N_HEADS)
    err = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
    print(f"max |bf16-mxu - xla| = {err:.5f} (bf16 resolution ~0.01 at these mags)")
    print(f"speedup: {d_f32/d_bf16:.2f}x")


if __name__ == "__main__":
    main()
