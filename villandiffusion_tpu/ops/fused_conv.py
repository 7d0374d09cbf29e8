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


# ---------------------------------------------------------------------------
# whole-res-block fusion: GN1+SiLU+conv1 (+temb) + GN2+SiLU+conv2 (+shortcut)
# in ONE HBM round-trip.
#
# XLA schedules the diffusers ResnetBlock2D chain as ~5 fusions whose conv
# bodies run at 144-151 TF/s when they also emit GroupNorm statistics
# (multi-output kOutput fusion) vs 178 TF/s clean — the activation still
# crosses HBM between every stage.  Here the entire block's intermediate
# state lives in VMEM: x is read once, the residual output written once,
# both GN stats passes are register-resident, and the two 3x3 convs +
# optional 1x1 shortcut run as 9+9+1 MXU matmuls on bf16 inputs with fp32
# accumulation.  Prototyped for VERDICT r3 ask #7 (the B=512, 16x16, C=256
# dominant shape); dispatch stays measured — see tools/perf_resblock.py.
# ---------------------------------------------------------------------------


def xla_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                 groups: int, eps: float, out_scale: float):
    """Reference chain exactly as models/unet2d.py::ResnetBlock composes it
    (GN in x.dtype like flax nn.GroupNorm(dtype=x.dtype), conv acc fp32).
    ``t`` is the already-projected time embedding (B, Cout); ``scw/scb``
    may be None for the identity shortcut."""
    h = xla_gn_silu_conv(x, s1, b1, w1, c1b, groups, eps)
    h = h + t.astype(h.dtype)[:, None, None, :]
    h = xla_gn_silu_conv(h, s2, b2, w2, c2b, groups, eps)
    if scw is not None:
        res = jax.lax.conv_general_dilated(
            x, scw.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + scb.astype(x.dtype)
    else:
        res = x
    return (res + h) / float(out_scale)


def _pallas_shape_supported(B, H, W, C, Cout, groups) -> bool:
    """Static admission rule for the Pallas whole-block kernel: every
    in-kernel reshape keeps the lane dim a multiple of 128 and the sublane
    dim a multiple of 8 (Mosaic's tiling rule; non-conforming dims are legal
    only when FULL, which holds for the onehot/vec operands by
    construction).  Shapes outside this family route to xla_resblock at
    dispatch time — compile-time kernel failures cannot be caught once an
    outer jit is tracing."""
    return (
        C % max(groups, 1) == 0
        and Cout % max(groups, 1) == 0
        and C % 128 == 0            # lane dim of x/y1 reshapes
        and Cout % 128 == 0         # lane dim of h/acc/out reshapes
        and (H * W) % 8 == 0        # sublane dim of (bB, hw, C) views
        # VMEM feasibility: even at batch-block 1 the per-row working set
        # (_resblock_batch_block's footprint formula) must fit the ~12 MB
        # budget — e.g. the 256px model's first-block resblocks
        # (H=W=256, C=Cout=128) pass every divisibility check but need
        # ~218 MB and would fail at Mosaic compile time, where no fallback
        # can run because dispatch already committed under an outer jit.
        and H * W * (C + Cout) * 13 <= 12 * 2**20
    )


def _resblock_batch_block(B, H, W, C, Cout, itemsize):
    """Largest divisor of B whose live VMEM footprint fits ~13 MB: fp32
    working copies of x and h (4+4 bytes/elt), two padded bf16 normalized
    copies (~2.6 each with halo), the fp32 conv accumulator (4), and the
    double-buffered bf16 in/out blocks (2x2 each)."""
    per_row = H * W * (C * 13 + Cout * 13)
    cap = max((12 * 2**20) // per_row, 1)
    bb = min(B, cap)
    while B % bb:
        bb -= 1
    return bb


def _gn_silu_vmem(xf, onehot_ref, scale_ref, bias_ref, eps, n):
    """fp32 (bB, hw, C) -> normalized+SiLU bf16, stats via MXU group reduce."""
    dot = functools.partial(
        jax.lax.dot_general,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    m = onehot_ref[...]                                    # (C, G)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    g1 = dot(s1, m, (((1,), (0,)), ((), ()))) / n
    g2 = dot(s2, m, (((1,), (0,)), ((), ()))) / n
    inv = jax.lax.rsqrt(g2 - g1 * g1 + eps)
    mean_c = dot(g1, m, (((1,), (1,)), ((), ())))          # (bB, C)
    inv_c = dot(inv, m, (((1,), (1,)), ((), ())))
    a = inv_c * scale_ref[...].astype(jnp.float32)
    bb_ = bias_ref[...].astype(jnp.float32) - mean_c * a
    y = xf * a[:, None, :] + bb_[:, None, :]
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


def _conv3x3_vmem(y, w_ref, H, W, Cout):
    """bf16 (bB, hw, C) -> fp32 (bB*H*W, Cout) via 9 shifted MXU matmuls."""
    bB = y.shape[0]
    C = y.shape[-1]
    yp = jnp.pad(y.reshape(bB, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bB * H * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = yp[:, dy:dy + H, dx:dx + W, :].reshape(bB * H * W, C)
            wk = w_ref[dy, dx].astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                patch, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _resblock_kernel(x_ref, t_ref, s1_ref, b1_ref, oh1_ref, w1_ref, c1b_ref,
                     s2_ref, b2_ref, oh2_ref, w2_ref, c2b_ref, *rest,
                     groups, eps, hw, H, W, out_scale, shortcut):
    if shortcut:
        scw_ref, scb_ref, o_ref = rest
    else:
        (o_ref,) = rest
    bB = x_ref.shape[0]
    C = x_ref.shape[-1]
    Cout = o_ref.shape[-1]

    xf = x_ref[...].reshape(bB, hw, C).astype(jnp.float32)
    y1 = _gn_silu_vmem(xf, oh1_ref, s1_ref, b1_ref, eps, hw * (C // groups))
    h = _conv3x3_vmem(y1, w1_ref, H, W, Cout)
    h = h + c1b_ref[...].astype(jnp.float32)
    # additive time conditioning (t already projected outside: tiny matmul);
    # t rides as (bB, 1, Cout) — Mosaic requires a block's last two dims be
    # (8, 128)-divisible or full, which (bB, Cout) violates at small bB
    h = h.reshape(bB, hw, Cout) + t_ref[...].astype(jnp.float32)

    y2 = _gn_silu_vmem(h, oh2_ref, s2_ref, b2_ref, eps, hw * (Cout // groups))
    acc = _conv3x3_vmem(y2, w2_ref, H, W, Cout)
    acc = acc + c2b_ref[...].astype(jnp.float32)

    if shortcut:
        res = jax.lax.dot_general(
            x_ref[...].reshape(bB * hw, C).astype(jnp.bfloat16),
            scw_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + scb_ref[...].astype(jnp.float32)
    else:
        res = xf.reshape(bB * hw, Cout)
    out = (res + acc) * (1.0 / out_scale)
    o_ref[...] = out.astype(o_ref.dtype).reshape(bB, H, W, Cout)


@functools.partial(jax.jit, static_argnums=(12, 13, 14))
def _pallas_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                     groups, eps, out_scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Cout = w1.shape[-1]
    HW = H * W
    shortcut = scw is not None
    bB = _resblock_batch_block(B, H, W, C, Cout, x.dtype.itemsize)
    oh1 = jnp.asarray(
        np.repeat(np.eye(groups, dtype=np.float32), C // groups, axis=0))
    oh2 = jnp.asarray(
        np.repeat(np.eye(groups, dtype=np.float32), Cout // groups, axis=0))
    kernel = functools.partial(
        _resblock_kernel, groups=groups, eps=eps, hw=HW, H=H, W=W,
        out_scale=out_scale, shortcut=shortcut,
    )

    def vec(n):
        return pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((bB, H, W, C), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bB, 1, Cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(C), vec(C),
        pl.BlockSpec((C, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, C, Cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(Cout),
        vec(Cout), vec(Cout),
        pl.BlockSpec((Cout, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, Cout, Cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(Cout),
    ]
    args = [x, t.reshape(B, 1, Cout), s1.reshape(1, C), b1.reshape(1, C), oh1,
            w1, c1b.reshape(1, Cout),
            s2.reshape(1, Cout), b2.reshape(1, Cout), oh2,
            w2, c2b.reshape(1, Cout)]
    if shortcut:
        in_specs.append(pl.BlockSpec((C, Cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(vec(Cout))
        args.append(scw.reshape(C, Cout))
        args.append(scb.reshape(1, Cout))

    flops = 2 * B * HW * Cout * C * (18 + (1 if shortcut else 0))
    return pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bB, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * HW * (C + Cout) * x.dtype.itemsize,
            transcendentals=2 * B * HW * max(C, Cout),
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def resblock_fused(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                   groups: int, eps: float, out_scale: float = 1.0):
    """Whole diffusers-ResnetBlock2D chain in one Pallas kernel (TPU), XLA
    reference elsewhere.  ``t``: pre-projected time embedding (B, Cout);
    ``scw``/``scb``: optional (1,1,C,Cout)/(Cout,) shortcut conv (None =
    identity, requires C == Cout)."""
    import os

    # The fallback decision must be STATIC (shape-based, decided before
    # tracing): when resblock_fused runs under an outer jit — the pipeline
    # scan or the train step, i.e. the normal path — a Mosaic lowering error
    # inside _pallas_resblock would only surface at the OUTER jit's compile,
    # long after any try/except here returned, so exception-based fallback
    # cannot protect the product path.  _pallas_shape_supported admits only
    # the block-shape family validated against the Mosaic tiling rules
    # (full-or-(8,128)-divisible trailing dims at every in-kernel reshape).
    B, H, W, C = x.shape
    Cout = w1.shape[-1]
    ok = (
        _is_tpu()
        and os.environ.get("VILLAN_FUSED_RESBLOCK", "0") != "0"
        and _pallas_shape_supported(B, H, W, C, Cout, groups)
    )
    if ok:
        scw2 = None if scw is None else scw.reshape(
            scw.shape[-2], scw.shape[-1])
        return _pallas_resblock(
            x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw2, scb,
            groups, eps, out_scale,
        )
    return xla_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                        groups, eps, out_scale)


def _rb_fwd(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
            groups, eps, out_scale):
    out = resblock_fused(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                         groups, eps, out_scale)
    return out, (x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb)


def _rb_bwd(groups, eps, out_scale, res, g):
    x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb = res
    args = (x, t, s1, b1, w1, c1b, s2, b2, w2, c2b)
    if scw is None:
        _, vjp = jax.vjp(
            lambda *a: xla_resblock(*a, None, None, groups, eps, out_scale),
            *args,
        )
        return vjp(g) + (None, None)
    _, vjp = jax.vjp(
        lambda *a: xla_resblock(*a, groups, eps, out_scale), *args, scw, scb
    )
    return vjp(g)


resblock_fused.defvjp(_rb_fwd, _rb_bwd)
