"""Fused GroupNorm + SiLU + 3x3 conv TPU kernel.

The sampling UNet on v5e is HBM-bandwidth-bound (~225 GB/s achievable on
this part, measured with raw elementwise probes).  XLA schedules
GN -> SiLU -> conv as (stats pass, normalize+act pass, conv pass): the
activation crosses HBM ~4x per pair.  This kernel does the whole pair in
ONE activation round-trip: a (bB, H, W, C) block is read into VMEM once,
group statistics + normalize + SiLU happen in registers/VMEM, and the 3x3
convolution is computed as 9 shifted (bB*H*W, C) @ (C, Cout) MXU matmuls
accumulated in fp32, written back once.

Requirements (all true for every resnet block in the UNet families here):
- full spatial extent per block (GN stats span H*W), SAME padding, stride 1
- C and Cout multiples of 8 (128-lane friendly), H*W*C block fits VMEM

Backward: recompute VJP through the XLA reference (train steps are conv-
dominated; GN+conv recompute is cheap next to the conv's own backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.ops.groupnorm import xla_group_norm


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_gn_silu_conv(x, scale, bias, w, b, groups: int, eps: float):
    """Reference path: GN + SiLU + SAME 3x3 conv (NHWC, HWIO)."""
    h = xla_group_norm(x, scale, bias, groups, eps, True)
    out = jax.lax.conv_general_dilated(
        h, w.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b.astype(out.dtype)


def _batch_block(B, H, W, C, Cout, itemsize):
    """Largest divisor of B fitting VMEM.  Live buffers per program:
    double-buffered in/out blocks, the fp32 working copy, the normalized
    bf16 copy + its halo pad, one shifted patch, and the fp32 accumulator —
    approx HW*(16*C + 8*Cout) bytes per batch row (bf16 inputs)."""
    s = max(itemsize, 2)
    per_row = H * W * (C * 8 * s + Cout * 4 * s)
    cap = max((13 * 2**20) // per_row, 1)
    bb = min(B, cap)
    while B % bb:
        bb -= 1
    return bb


def _kernel(x_ref, scale_ref, bias_ref, onehot_ref, w_ref, b_ref, o_ref, *,
            groups, eps, hw, cg, H, W):
    bB = x_ref.shape[0]
    C = x_ref.shape[-1]
    Cout = o_ref.shape[-1]
    dot = functools.partial(
        jax.lax.dot_general,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # ---- GroupNorm stats (fp32, HIGHEST-precision MXU group reduce) ----
    xb = x_ref[...].reshape(bB, hw, C)
    xf = xb.astype(jnp.float32)
    m = onehot_ref[...]                                    # (C, G)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    n = hw * cg
    g1 = dot(s1, m, (((1,), (0,)), ((), ()))) / n
    g2 = dot(s2, m, (((1,), (0,)), ((), ()))) / n
    inv = jax.lax.rsqrt(g2 - g1 * g1 + eps)
    mean_c = dot(g1, m, (((1,), (1,)), ((), ())))          # (bB, C)
    inv_c = dot(inv, m, (((1,), (1,)), ((), ())))
    a = inv_c * scale_ref[...].astype(jnp.float32)
    bb_ = bias_ref[...].astype(jnp.float32) - mean_c * a

    # ---- normalize + SiLU (bf16 for the matmul inputs) ----
    y = xf * a[:, None, :] + bb_[:, None, :]
    y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
    y = y.reshape(bB, H, W, C)
    # SAME padding halo
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # ---- 3x3 conv as 9 shifted matmuls accumulated in fp32 ----
    acc = jnp.zeros((bB * H * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = yp[:, dy:dy + H, dx:dx + W, :].reshape(bB * H * W, C)
            wk = w_ref[dy, dx].astype(jnp.bfloat16)        # (C, Cout)
            acc = acc + jax.lax.dot_general(
                patch, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(bB, H, W, Cout)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _pallas_gn_silu_conv(x, scale, bias, w, b, groups, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Cout = w.shape[-1]
    HW, cg = H * W, C // groups
    bB = _batch_block(B, H, W, C, Cout, x.dtype.itemsize)
    onehot = jnp.asarray(
        np.repeat(np.eye(groups, dtype=np.float32), cg, axis=0)
    )
    kernel = functools.partial(
        _kernel, groups=groups, eps=eps, hw=HW, cg=cg, H=H, W=W
    )
    flops = 2 * B * HW * 9 * C * Cout
    return pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, Cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bB, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * HW * (C + Cout) * x.dtype.itemsize,
            transcendentals=B * HW * C,
        ),
    )(x, scale.reshape(1, C), bias.reshape(1, C), onehot, w, b.reshape(1, Cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gn_silu_conv(x, scale, bias, w, b, groups: int, eps: float):
    """GroupNorm + SiLU + SAME 3x3 conv in one HBM round-trip (TPU Pallas);
    XLA reference elsewhere.  w: (3, 3, C, Cout) HWIO, b: (Cout,)."""
    import os

    # Only large feature maps win: at H*W < 1024 the pallas_call's fusion
    # barrier (XLA can no longer fold neighboring adds/casts into the conv)
    # costs more than the saved GN round-trip (v5e: 167 -> 135 imgs/s when
    # fused everywhere, vs isolated-pair win at 32x32).
    big = x.shape[1] * x.shape[2] >= 1024
    if big and _is_tpu() and os.environ.get("VILLAN_FUSED_CONV", "1") != "0":
        try:
            return _pallas_gn_silu_conv(x, scale, bias, w, b, groups, eps)
        except Exception:  # pragma: no cover - kernel regressions fall back
            pass
    return xla_gn_silu_conv(x, scale, bias, w, b, groups, eps)


def _fwd(x, scale, bias, w, b, groups, eps):
    return gn_silu_conv(x, scale, bias, w, b, groups, eps), (x, scale, bias, w, b)


def _bwd(groups, eps, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, ww, bc: xla_gn_silu_conv(xx, ss, bb, ww, bc, groups, eps),
        x, scale, bias, w, b,
    )
    return vjp(g)


gn_silu_conv.defvjp(_fwd, _bwd)
