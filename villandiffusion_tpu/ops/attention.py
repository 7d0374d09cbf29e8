"""Spatial self-attention for UNet blocks.

The UNet attends over H*W spatial tokens (<= 4096 even at 512px latents, see
SURVEY.md §5.7), so one fused kernel per (batch, head) is the right shape —
no sequence sharding needed.  On TPU a Pallas flash-attention kernel keeps
the softmax fused in VMEM, streaming KV blocks with an online-softmax
accumulator so the full T x T logits matrix never materializes (64 MB at
T=4096 would blow the ~16 MB VMEM budget).  Elsewhere (CPU tests) we fall
back to the XLA einsum path, which the compiler fuses adequately at these
sizes.
"""

from __future__ import annotations

import functools
import os

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


def _block_sizes(T: int, hd: int) -> tuple:
    """(q_block, kv_block): whole sequence when small, 512-token tiles when
    streaming is needed.  All UNet resolutions give T a power of two
    (H*W with H=W in {8,16,32,64}); hd is a multiple of 8."""
    if T <= 1024:
        return T, T
    blk = 512
    while T % blk:
        blk //= 2
    return blk, blk


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_i, l_i, *, scale, kv_steps):
    """Grid: (BH, q_blocks, kv_blocks); kv innermost so the accumulator in
    VMEM scratch carries across kv steps for a fixed q block."""
    kv_i = _pl().program_id(2)

    @_pl().when(kv_i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_i[:] = jnp.full_like(m_i, -jnp.inf)
        l_i[:] = jnp.zeros_like(l_i)

    qb = q_ref[0].astype(jnp.float32) * scale          # (bq, hd)
    kb = k_ref[0].astype(jnp.float32)                  # (bkv, hd)
    vb = v_ref[0].astype(jnp.float32)                  # (bkv, hd)

    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                   # (bq, bkv)
    m_new = jnp.maximum(m_i[:], jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_i[:] - m_new)
    l_i[:] = l_i[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_i[:] = m_new

    @_pl().when(kv_i == kv_steps - 1)
    def _done():
        o_ref[0] = (acc[:] / l_i[:]).astype(o_ref.dtype)


def _pl():
    from jax.experimental import pallas as pl

    return pl


def _packing_factor(BH: int, T: int, hd: int, itemsize: int) -> int:
    """Rows per grid step for the packed kernel, from a VMEM budget:
    double-buffered q/k/v/o blocks at the input dtype plus the fp32 logits
    tile and its exp temp must stay under the scoped VMEM limit.  The 14 MB
    threshold is bracketed empirically on v5e: the bf16 CIFAR hot shape at
    G=8 (12.6 MB by this model) runs and measures fastest, while fp32
    inputs at T=256, G=8 (21 MB) OOM the kernel."""
    G = 8
    while G > 1 and (
        BH % G or
        2 * 4 * G * T * hd * itemsize + 2 * G * T * T * 4 > 14 * 1024 * 1024
    ):
        G //= 2
    return G


@functools.partial(jax.jit, static_argnums=(3,))
def _pallas_attention_packed(q, k, v, n_heads):
    """Small-T attention: pack several (batch, head) rows per grid step and
    compute the full softmax in VMEM — no online-softmax bookkeeping.

    At UNet spatial shapes (T <= 512) the per-row matmuls are tiny
    (T x T x hd), so the flash kernel's grid of B*H single-image rows
    under-fills the MXU pipeline; batching G rows per step measures ~30%
    faster at the CIFAR hot shape (B=512, T=256, C=256: 0.99 ms vs 1.40 ms
    in-scan on v5e).  The (G, T, T) logits tile stays comfortably inside
    VMEM (G=8, T=256: 2 MB fp32)."""
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
        qb = q_ref[...].astype(jnp.float32) * scale      # (G, T, hd)
        kb = k_ref[...].astype(jnp.float32)
        vb = v_ref[...].astype(jnp.float32)
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                 # (G, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[...] = jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
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


@functools.partial(jax.jit, static_argnums=(3,))
def _pallas_attention(q, k, v, n_heads):
    """Blocked flash attention: one (batch*head) per grid row, q/kv tiles
    streamed through VMEM with an online-softmax scratch accumulator."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = q.shape
    hd = C // n_heads
    scale = 1.0 / np.sqrt(hd)
    bq, bkv = _block_sizes(T, hd)
    q_steps, kv_steps = T // bq, T // bkv

    def split(x):
        return x.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3).reshape(
            B * n_heads, T, hd
        )

    qh, kh, vh = split(q), split(k), split(v)

    kernel = functools.partial(_flash_kernel, scale=scale, kv_steps=kv_steps)
    out = pl.pallas_call(
        kernel,
        grid=(B * n_heads, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, hd), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, hd), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * n_heads, T, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),   # output accumulator
            pltpu.VMEM((bq, 1), jnp.float32),    # running max
            pltpu.VMEM((bq, 1), jnp.float32),    # running denom
        ],
    )(qh, kh, vh)
    return (
        out.reshape(B, n_heads, T, hd).transpose(0, 2, 1, 3).reshape(B, T, C)
    )


def _forward_dispatch(q, k, v, n_heads: int) -> jnp.ndarray:
    """Measured kernel choice for the forward pass (TPU only)."""
    try:
        B, T, C = q.shape
        hd = C // n_heads
        if T <= 512:
            return _pallas_attention_packed(q, k, v, n_heads)
        # Measured on v5e (SD-v1 self-attn shapes, bf16, in-scan): the
        # KV-streaming kernel wins at hd >= 64 at any batch (T=1024,
        # hd=80: 4.8-5.7 ms vs ~10+ ms XLA) and at narrow heads only
        # while B*heads <= 64 (T=4096, hd=40: 10.8 ms @BH=64 beats XLA,
        # 18.9 ms @BH=128 loses to XLA's 10.5 ms fused softmax — the
        # 40-wide blocks underfill the 128-lane MXU and more concurrent
        # rows just queue behind it).
        if hd >= 64 or B * n_heads <= 64:
            return _pallas_attention(q, k, v, n_heads)
        return xla_attention(q, k, v, n_heads)
    except Exception as e:  # pragma: no cover - kernel regressions fall back
        _warn_fallback_once(e)
        return xla_attention(q, k, v, n_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_ad(q, k, v, n_heads: int):
    """Pallas forward with an XLA-math backward.

    The Pallas kernels don't support reverse-mode AD (linearization of
    pallas_call fails), which previously made every *training* forward pass
    silently fall back to XLA attention.  custom_vjp keeps the measured
    fast forward and computes exact attention gradients by recomputing the
    softmax in the backward pass with plain einsums (flash-attention's
    standard recompute strategy — no T x T tensor is saved between passes).
    """
    return _forward_dispatch(q, k, v, n_heads)


def _attention_ad_fwd(q, k, v, n_heads: int):
    return _forward_dispatch(q, k, v, n_heads), (q, k, v)


def _attention_ad_bwd(n_heads: int, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: xla_attention(a, b, c, n_heads), q, k, v)
    return vjp(g)


_attention_ad.defvjp(_attention_ad_fwd, _attention_ad_bwd)


def spatial_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_heads: int = 1
) -> jnp.ndarray:
    """Dispatch: Pallas on TPU (packed full-softmax kernel for small T,
    KV-streaming flash kernel above; AD-safe via custom_vjp), XLA
    elsewhere."""
    if _is_tpu():
        return _attention_ad(q, k, v, n_heads)
    return xla_attention(q, k, v, n_heads)


# ---------------------------------------------------------------------------
# Fused attention BLOCK: GroupNorm + QKV projection + softmax-attention +
# output projection + residual in ONE kernel.  Motivation (v5e per-op
# roofline, BASELINE.md): at the DDIM-50 headline shape the packed QK/AV
# kernel is only ~1/3 of attention-block time; the GN, four projection
# GEMMs, and residual adds around it are bandwidth-bound XLA ops that
# re-stream the (B, T, C) activation seven times.  The fused kernel streams
# it once per direction.
# ---------------------------------------------------------------------------


def attention_block_ref(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups: int, eps: float, n_heads: int, rescale: float,
):
    """XLA reference composition (also the AD / non-TPU path).  Matmuls run
    in the promoted dtype of (x, weights), mirroring flax nn.Dense."""
    B, T, C = x.shape
    dt = jnp.promote_types(x.dtype, wq.dtype)
    xf = x.astype(jnp.float32)
    g = xf.reshape(B, T, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    h = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, T, C)
    h = h * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    h = h.astype(dt)
    q = h @ wq.astype(dt) + bq.astype(dt)
    k = h @ wk.astype(dt) + bk.astype(dt)
    v = h @ wv.astype(dt) + bv.astype(dt)
    o = spatial_attention(q, k, v, n_heads)
    y = o.astype(dt) @ wo.astype(dt) + bo.astype(dt)
    out = (x.astype(jnp.float32) + y.astype(jnp.float32)) / rescale
    return out.astype(x.dtype)


def _block_pack_factor(B: int, T: int, C: int, itemsize: int = 2) -> int:
    """Rows per grid step from a VMEM budget: double-buffered x/out blocks,
    the weight set, and the f32 logits/qkv temporaries must fit.

    ``itemsize`` is the byte width of x/weights (2 for the bf16 sampling
    path, 4 when the kernel runs on an f32 forward): the block/weight terms
    scale with it, so an f32 call halves G rather than overrunning VMEM at
    Mosaic compile time (where the dispatch try/except can't catch it)."""
    G = 8
    while G > 1:
        blocks = 2 * 2 * G * T * C * itemsize       # x + out, double-buffered
        weights = 2 * (4 * C * C + 8 * C) * itemsize  # wqkv/wo + biases
        temps = (
            G * T * 3 * C * 4                       # qkv f32 accum
            + 2 * G * T * T * 4                     # logits + exp
            + 2 * G * T * C * 4                     # h, o f32
        )
        # 20 MB bracketed empirically on v5e: G=8 at the CIFAR hot shape
        # (modeled ~19 MB) runs and beats G=4 (14 MB budget) 1.34 vs 1.38 ms
        budget = int(os.environ.get("VILLAN_ATTN_BLOCK_VMEM_MB", "20")) * 1024 * 1024
        if B % G == 0 and blocks + weights + temps <= budget:
            return G
        G //= 2
    return 1


@functools.partial(jax.jit, static_argnums=(11, 12, 13, 14))
def _attention_block_fused(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups: int, eps: float, n_heads: int, rescale: float,
):
    """Single-head fused block kernel (T <= 512, the UNet2D hot shapes).

    Per grid step of G batch rows, entirely in VMEM: f32 GroupNorm stats
    (channel->group reduction via a 0/1 indicator matmul — lane-dim
    reshapes are fragile in Mosaic, tiny MXU matmuls are not), one merged
    (C, 3C) QKV GEMM, full-softmax attention, output projection, residual."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    cg = C // groups
    scale = 1.0 / np.sqrt(C // n_heads)
    G = _block_pack_factor(B, T, C, jnp.dtype(x.dtype).itemsize)

    wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(x.dtype)   # (C, 3C)
    bqkv = jnp.concatenate([bq, bk, bv]).astype(jnp.float32)       # (3C,)
    # channel->group indicator (C, groups) and its transpose as separate
    # operands (in-kernel transposes are fragile in Mosaic); f32 keeps the
    # stats exact
    M_np = np.repeat(np.eye(groups, dtype=np.float32), cg, axis=0)
    M = jnp.asarray(M_np)
    MT = jnp.asarray(M_np.T.copy())

    def kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
               m_ref, mt_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)                        # (G,T,C)
        sc = jnp.sum(xf, axis=1)                                   # (G,C)
        sq = jnp.sum(xf * xf, axis=1)                              # (G,C)
        m = m_ref[...]                                             # (C,groups)
        n = jnp.float32(T * cg)
        mean_g = jax.lax.dot(sc, m) / n                            # (G,groups)
        var_g = jax.lax.dot(sq, m) / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        # broadcast group stats back to channels (groups -> C)
        mt = mt_ref[...]                                           # (groups,C)
        mean_c = jax.lax.dot(mean_g, mt)                           # (G,C)
        inv_c = jax.lax.dot(inv_g, mt)
        a = inv_c * g_ref[...].astype(jnp.float32)[None, :]        # (G,C)
        bb = b_ref[...].astype(jnp.float32)[None, :] - mean_c * a
        h = (xf * a[:, None, :] + bb[:, None, :]).astype(x_ref.dtype)
        qkv = jax.lax.dot(
            h.reshape(G * T, C), wqkv_ref[...],
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...][None, :]                                 # (G*T,3C)
        qkv = qkv.astype(x_ref.dtype)
        q = qkv[:, :C].reshape(G, T, C)
        k = qkv[:, C:2 * C].reshape(G, T, C)
        v = qkv[:, 2 * C:].reshape(G, T, C)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # (G,T,T)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x_ref.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)                                      # (G,T,C)
        y = jax.lax.dot(
            o.reshape(G * T, C), wo_ref[...],
            preferred_element_type=jnp.float32,
        ) + bo_ref[...][None, :]                                   # (G*T,C)
        out = (xf + y.reshape(G, T, C)) * jnp.float32(1.0 / rescale)
        o_ref[...] = out.astype(o_ref.dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
            full((C, 3 * C)), full((3 * C,)),
            full((C, C)), full((C,)),
            full((C, groups)), full((groups, C)),
        ],
        out_specs=pl.BlockSpec(
            (G, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
    )(x, gamma.astype(x.dtype), beta.astype(x.dtype), wqkv, bqkv,
      wo.astype(x.dtype), bo.astype(jnp.float32), M, MT)
    return out


def _block_forward_dispatch(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups, eps, n_heads, rescale,
):
    B, T, C = x.shape
    # fused kernel: single-head small-T inference shapes with everything in
    # one dtype (the bf16 sampling path); otherwise the XLA composition,
    # whose matmul promotion semantics match flax nn.Dense
    if (
        _is_tpu()
        and n_heads == 1
        and T <= 512
        and x.dtype == wq.dtype
        and C % groups == 0
    ):
        try:
            return _attention_block_fused(
                x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
                groups, float(eps), n_heads, float(rescale),
            )
        except Exception as e:  # pragma: no cover - kernel regressions
            _warn_fallback_once(e)
    return attention_block_ref(
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
        groups, eps, n_heads, rescale,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _attention_block_ad(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups, eps, n_heads, rescale,
):
    """Fused forward with an XLA-math backward (same strategy as
    _attention_ad: pallas_call has no reverse-mode linearization)."""
    return _block_forward_dispatch(
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
        groups, eps, n_heads, rescale,
    )


def _attention_block_ad_fwd(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups, eps, n_heads, rescale,
):
    out = _block_forward_dispatch(
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
        groups, eps, n_heads, rescale,
    )
    return out, (x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo)


def _attention_block_ad_bwd(groups, eps, n_heads, rescale, res, g):
    _, vjp = jax.vjp(
        lambda *a: attention_block_ref(*a, groups, eps, n_heads, rescale),
        *res,
    )
    return vjp(g)


_attention_block_ad.defvjp(_attention_block_ad_fwd, _attention_block_ad_bwd)


def attention_block(
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
    groups: int, eps: float, n_heads: int = 1, rescale: float = 1.0,
):
    """Full spatial self-attention block over (B, T, C) tokens:
    ``(x + proj(attn(qkv(groupnorm(x)))))/rescale`` — fused Pallas kernel on
    TPU inference shapes, XLA composition elsewhere; AD-safe."""
    if _is_tpu():
        return _attention_block_ad(
            x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
            groups, eps, n_heads, rescale,
        )
    return attention_block_ref(
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
        groups, eps, n_heads, rescale,
    )


@functools.lru_cache(maxsize=1)
def _warn_fallback_once_impl(msg: str) -> None:
    import warnings

    warnings.warn(
        "Pallas attention kernel failed; silently degrading to XLA attention "
        f"would hide a perf regression. Cause: {msg}",
        RuntimeWarning,
    )


def _warn_fallback_once(e: Exception) -> None:
    _warn_fallback_once_impl(f"{type(e).__name__}: {e}")
