"""Spatial self-attention for UNet blocks.

The UNet attends over H*W spatial tokens (<= 4096 even at 512px latents, see
SURVEY.md §5.7), so a single fused kernel per (batch, head) is the right
shape — no sequence sharding needed.  On TPU a Pallas flash-attention kernel
keeps the softmax fused in VMEM; elsewhere (CPU tests) we fall back to the
XLA einsum path, which the compiler fuses adequately for these sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Reference attention: (B, T, C) -> (B, T, C), fp32 softmax."""
    B, T, C = q.shape
    hd = C // n_heads

    def split(x):
        return x.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C).astype(q.dtype)


@functools.partial(jax.jit, static_argnums=(3,))
def _pallas_attention(q, k, v, n_heads):
    """Fused flash-attention over spatial tokens (single kv block: T <= 4096
    fits comfortably in VMEM at these sizes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = q.shape
    hd = C // n_heads
    scale = 1.0 / np.sqrt(hd)

    # Layout: fold heads into the grid; process one (batch, head) per program.
    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0].astype(jnp.float32) * scale          # (T, hd)
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (T, T)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0] = o.astype(o_ref.dtype)

    def split(x):
        return x.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3).reshape(
            B * n_heads, T, hd
        )

    qh, kh, vh = split(q), split(k), split(v)
    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    out = pl.pallas_call(
        kernel,
        grid=(B * n_heads,),
        in_specs=[
            pl.BlockSpec((1, T, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * n_heads, T, hd), q.dtype),
    )(qh, kh, vh)
    return (
        out.reshape(B, n_heads, T, hd).transpose(0, 2, 1, 3).reshape(B, T, C)
    )


def spatial_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_heads: int = 1
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA elsewhere."""
    if _is_tpu():
        try:
            return _pallas_attention(q, k, v, n_heads)
        except Exception:  # pragma: no cover - kernel regressions fall back
            return xla_attention(q, k, v, n_heads)
    return xla_attention(q, k, v, n_heads)
