"""Microbench attention variants at UNet shapes on the real chip."""
import time
import functools
import jax, jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.ops.attention import _pallas_attention, xla_attention


def timed(fn, q, k, v, n=50):
    """Time fn inside a lax.scan (chained carry), like the denoise loop."""

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            return fn(c, k, v).astype(q.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(jax.device_get(run(q, k, v)))
    t0 = time.perf_counter()
    float(jax.device_get(run(q, k, v)))
    return (time.perf_counter() - t0) / n


def batched_rows_pallas(q, k, v, n_heads, rows):
    """Fold `rows` batch items into one grid row; per-image dots batched
    inside the kernel (dot_general with a batch dim)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = q.shape
    hd = C // n_heads
    scale = 1.0 / np.sqrt(hd)
    BH = B * n_heads

    def split(x):
        return x.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3).reshape(BH, T, hd)

    qh, kh, vh = split(q), split(k), split(v)
    G = rows
    assert BH % G == 0

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[...].astype(jnp.float32) * scale   # (G, T, hd)
        kb = k_ref[...].astype(jnp.float32)
        vb = v_ref[...].astype(jnp.float32)
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # (G, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o.astype(o_ref.dtype)

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


def main():
    shapes = [
        (512, 256, 256, 1),   # CIFAR 16x16 attn (down_1/up_2/mid)
        (32, 256, 512, 1),    # 256px model mid (16x16, C=512)
        (32, 1024, 512, 1),   # 256px attn stage (32x32, C=512)-ish
        (8, 4096, 512, 8),    # SD 64x64 latent self-attn
    ]
    for B, T, C, H in shapes:
        kq = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.bfloat16)
        kk = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.bfloat16)
        kv = jax.random.normal(jax.random.PRNGKey(2), (B, T, C), jnp.bfloat16)
        flops = 4 * B * T * T * C
        res = {}
        res["pallas_cur"] = timed(
            jax.jit(functools.partial(_pallas_attention, n_heads=H)), kq, kk, kv
        )
        res["xla"] = timed(
            jax.jit(functools.partial(xla_attention, n_heads=H)), kq, kk, kv
        )
        for rows in (4, 8, 16):
            if (B * H) % rows == 0 and T <= 1024:
                try:
                    res[f"rows{rows}"] = timed(
                        jax.jit(functools.partial(batched_rows_pallas, n_heads=H, rows=rows)),
                        kq, kk, kv,
                    )
                except Exception as e:
                    print("rows", rows, "failed:", str(e)[:120])
                    res[f"rows{rows}"] = float("nan")
        msg = " ".join(
            f"{k}={v*1e3:.3f}ms({flops/v/1e12:.0f}TF/s)" for k, v in res.items()
        )
        print(f"B={B} T={T} C={C} H={H}: {msg}")


if __name__ == "__main__":
    main()
