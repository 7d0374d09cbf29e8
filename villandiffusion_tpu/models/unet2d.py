"""Flax UNet2D for pixel/latent diffusion (DDPM + NCSN++ families), NHWC.

TPU-first design
----------------
- NHWC layout end-to-end (native for TPU convolutions; the reference's NCHW
  is a CUDA convention).
- All convs/matmuls run through XLA with `preferred_element_type=float32`
  accumulation; a bf16 compute policy is applied at the train-step level by
  casting inputs/params, while master params stay fp32.
- Self-attention uses `villandiffusion_tpu.ops.attention` (Pallas flash
  kernel on TPU, XLA fallback elsewhere).
- No data-dependent Python control flow: the block structure is static from
  the config, so a single `jit` trace covers the whole net.

Architecture parity: mirrors the computation graph of HF diffusers
``UNet2DModel`` as configured by the reference factory
(/root/reference/model.py:816-834 DDPM config; :836-858 NCSN++ config) so
that converted torch checkpoints produce identical outputs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 3
    out_channels: int = 3
    sample_size: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 256)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "AttnDownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "UpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
    )
    layers_per_block: int = 2
    downsample_padding: int = 0
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    flip_sin_to_cos: bool = False
    freq_shift: float = 1.0
    time_embedding_type: str = "positional"  # or "fourier" (NCSN++)
    mid_block_scale_factor: float = 1.0
    attention_head_dim: Optional[int] = None  # None -> single head
    add_attention: bool = True
    center_input_sample: bool = False
    resnet_time_scale_shift: str = "default"

    @classmethod
    def ddpm_32(cls, channels: int = 3, sample_size: int = 32) -> "UNet2DConfig":
        """Fresh DDPM config used by the reference for from-scratch training
        (/root/reference/model.py:816-834)."""
        return cls(in_channels=channels, out_channels=channels, sample_size=sample_size)

    @classmethod
    def ddpm_cifar10(cls) -> "UNet2DConfig":
        """google/ddpm-cifar10-32 architecture."""
        return cls()

    @classmethod
    def ddpm_256(cls, channels: int = 3) -> "UNet2DConfig":
        """google/ddpm-(ema-)celebahq/church/bedroom-256 architecture."""
        return cls(
            in_channels=channels,
            out_channels=channels,
            sample_size=256,
            block_out_channels=(128, 128, 256, 256, 512, 512),
            down_block_types=(
                "DownBlock2D",
                "DownBlock2D",
                "DownBlock2D",
                "DownBlock2D",
                "AttnDownBlock2D",
                "DownBlock2D",
            ),
            up_block_types=(
                "UpBlock2D",
                "AttnUpBlock2D",
                "UpBlock2D",
                "UpBlock2D",
                "UpBlock2D",
                "UpBlock2D",
            ),
            flip_sin_to_cos=True,
            freq_shift=0.0,
            downsample_padding=0,
        )

    @classmethod
    def ldm_celebahq_unet(cls) -> "UNet2DConfig":
        """CompVis/ldm-celebahq-256 denoising UNet (latent space 64x64x3)."""
        return cls(
            in_channels=3,
            out_channels=3,
            sample_size=64,
            block_out_channels=(224, 448, 672, 896),
            down_block_types=(
                "DownBlock2D",
                "AttnDownBlock2D",
                "AttnDownBlock2D",
                "AttnDownBlock2D",
            ),
            up_block_types=(
                "AttnUpBlock2D",
                "AttnUpBlock2D",
                "AttnUpBlock2D",
                "UpBlock2D",
            ),
            layers_per_block=2,
            flip_sin_to_cos=True,
            freq_shift=0.0,
            norm_num_groups=32,
            attention_head_dim=32,
            downsample_padding=1,
        )

    @classmethod
    def ncsnpp_32(cls, channels: int = 3, sample_size: int = 32) -> "UNet2DConfig":
        """Fresh NCSN++ (VE) config (/root/reference/model.py:836-858)."""
        return cls(
            in_channels=channels,
            out_channels=channels,
            sample_size=sample_size,
            block_out_channels=(128, 256, 256, 256),
            down_block_types=(
                "SkipDownBlock2D",
                "AttnSkipDownBlock2D",
                "SkipDownBlock2D",
                "SkipDownBlock2D",
            ),
            up_block_types=(
                "SkipUpBlock2D",
                "SkipUpBlock2D",
                "AttnSkipUpBlock2D",
                "SkipUpBlock2D",
            ),
            layers_per_block=4,
            downsample_padding=1,
            flip_sin_to_cos=True,
            freq_shift=0.0,
            norm_num_groups=None,
            norm_eps=1e-6,
            time_embedding_type="fourier",
            mid_block_scale_factor=1.41421356237,
        )


# ---------------------------------------------------------------------------
# small layers
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool,
    freq_shift: float,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics, incl. the freq_shift denominator offset)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    args = scale * args
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Random Fourier features for continuous (sigma) conditioning (NCSN++)."""

    embedding_size: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        W = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        W = jax.lax.stop_gradient(W)
        x_proj = jnp.log(x.astype(jnp.float32))[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    padding: int = 1
    name_: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


class FusedGroupNorm(nn.Module):
    """GroupNorm(+SiLU) through the fused Pallas kernel (ops/groupnorm.py).

    Same param tree as flax nn.GroupNorm ({scale, bias}); output dtype
    follows the input — pinning float32 here would upcast every downstream
    conv activation, 2x the HBM traffic of a bandwidth-bound UNet (both
    effects measured directly in TPU v5e profiles)."""

    groups: int
    eps: float
    act: bool = False

    @nn.compact
    def __call__(self, x):
        import os

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if os.environ.get("VILLAN_GN_KERNEL") == "pallas":
            from villandiffusion_tpu.ops.groupnorm import group_norm_silu

            return group_norm_silu(x, scale, bias, self.groups, self.eps, self.act)
        # default: flax GN — XLA fuses its normalize multiply into the
        # surrounding convs, which benchmarks faster than any standalone
        # kernel here (see ops/groupnorm.py for the v5e measurements)
        gn = nn.GroupNorm(
            num_groups=self.groups, epsilon=self.eps, dtype=x.dtype,
            use_scale=False, use_bias=False,
        )
        y = gn.apply({}, x)
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return nn.silu(y) if self.act else y


def group_norm(x, groups, eps, name, act=False):
    return FusedGroupNorm(groups=groups, eps=eps, act=act, name=name)(x)


def _fir_kernel() -> np.ndarray:
    k = np.array([1.0, 3.0, 3.0, 1.0])
    K = np.outer(k, k)
    return K / K.sum()


def fir_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """FIR anti-aliased 2x downsample (NCSN++ [1,3,3,1] kernel), depthwise."""
    C = x.shape[-1]
    K = jnp.asarray(_fir_kernel(), x.dtype)
    kern = jnp.tile(K[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def fir_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """FIR 2x upsample: zero-stuff then filter with gain 4, depthwise."""
    B, H, W, C = x.shape
    up = jnp.zeros((B, H * 2, W * 2, C), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    K = jnp.asarray(_fir_kernel() * 4.0, x.dtype)
    kern = jnp.tile(K[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        up, kern, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def _auto_groups(channels: int, groups: Optional[int]) -> int:
    """norm_num_groups=None (NCSN++) -> min(channels // 4, 32)."""
    return groups if groups is not None else min(channels // 4, 32)


class _Params(nn.Module):
    """Param holder exposing {names[0]: shape, names[1]: bias_shape} leaves —
    lets the fused GN+conv kernel consume raw param values while keeping the
    param tree byte-identical to the unfused nn.GroupNorm / nn.Conv modules
    (same submodule name, same leaf names, same initializers)."""

    shape: tuple
    init: object
    names: tuple = ("scale", "bias")
    bias_shape: Optional[tuple] = None

    @nn.compact
    def __call__(self):
        a = self.param(self.names[0], self.init, self.shape, jnp.float32)
        bshape = self.bias_shape or self.shape
        b = self.param(self.names[1], nn.initializers.zeros, bshape, jnp.float32)
        return a, b


class ResnetBlock(nn.Module):
    """GroupNorm-SiLU-Conv x2 with additive time conditioning, matching
    diffusers ResnetBlock2D (default, non-scale-shift).  ``updown`` applies
    FIR resampling to both branches (NCSN++ resnet_up/resnet_down).

    The two GN->SiLU->conv pairs run through the fused one-round-trip TPU
    kernel (ops/fused_conv.py) whenever no FIR resample sits between them;
    param tree matches the unfused modules exactly."""

    out_channels: int
    groups: Optional[int]
    eps: float
    output_scale_factor: float = 1.0
    use_shortcut: Optional[bool] = None
    updown: str = "none"  # "none" | "up" | "down"

    def _gn_conv(self, x, in_ch, norm_name, conv_name):
        import os

        # Default: unfused flax GN + conv.  XLA folds the normalize multiply
        # and SiLU into the conv fusions, which measures FASTER end-to-end
        # than the hand-fused Pallas pair even where the pair wins isolated
        # (v5e: 167 vs 132 imgs/s DDIM-50) — the pallas_call is a fusion
        # barrier for the neighboring adds/casts.  VILLAN_FUSED_CONV=1 keeps
        # the kernel selectable for parts where the balance differs.
        if os.environ.get("VILLAN_FUSED_CONV") != "1":
            h = group_norm(
                x, _auto_groups(in_ch, self.groups), self.eps, norm_name,
                act=True,
            )
            return nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                param_dtype=jnp.float32, name=conv_name,
            )(h)
        from villandiffusion_tpu.ops.fused_conv import gn_silu_conv

        s, b = _Params((in_ch,), nn.initializers.ones, name=norm_name)()
        k, kb = _Params(
            (3, 3, in_ch, self.out_channels), nn.initializers.lecun_normal(),
            names=("kernel", "bias"), bias_shape=(self.out_channels,),
            name=conv_name,
        )()
        return gn_silu_conv(
            x, s, b, k, kb, _auto_groups(in_ch, self.groups), self.eps
        )

    def _fused_whole_block(self, x, temb, in_ch, use_sc):
        """The entire block through ONE Pallas kernel (ops/fused_conv.py::
        resblock_fused): x read from HBM once, residual written once, both
        GN stats VMEM-resident.  Param tree stays byte-identical to the
        unfused modules."""
        from villandiffusion_tpu.ops.fused_conv import resblock_fused

        s1, b1 = _Params((in_ch,), nn.initializers.ones, name="norm1")()
        w1, c1b = _Params(
            (3, 3, in_ch, self.out_channels), nn.initializers.lecun_normal(),
            names=("kernel", "bias"), bias_shape=(self.out_channels,),
            name="conv1",
        )()
        tw, tb = _Params(
            (temb.shape[-1], self.out_channels), nn.initializers.lecun_normal(),
            names=("kernel", "bias"), bias_shape=(self.out_channels,),
            name="time_emb_proj",
        )()
        s2, b2 = _Params((self.out_channels,), nn.initializers.ones, name="norm2")()
        w2, c2b = _Params(
            (3, 3, self.out_channels, self.out_channels),
            nn.initializers.lecun_normal(),
            names=("kernel", "bias"), bias_shape=(self.out_channels,),
            name="conv2",
        )()
        scw = scb = None
        if use_sc:
            scw, scb = _Params(
                (1, 1, in_ch, self.out_channels),
                nn.initializers.lecun_normal(),
                names=("kernel", "bias"), bias_shape=(self.out_channels,),
                name="conv_shortcut",
            )()
        t = nn.silu(temb) @ tw + tb
        groups = _auto_groups(in_ch, self.groups)
        return resblock_fused(
            x, t.astype(x.dtype), s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
            groups, self.eps, float(self.output_scale_factor),
        )

    @nn.compact
    def __call__(self, x, temb):
        import os

        in_ch = x.shape[-1]
        use_sc = self.use_shortcut
        if use_sc is None:
            use_sc = in_ch != self.out_channels or self.updown != "none"
        if (
            self.updown == "none"
            and os.environ.get("VILLAN_FUSED_RESBLOCK") == "1"
            and _auto_groups(in_ch, self.groups)
            == _auto_groups(self.out_channels, self.groups)
        ):
            return self._fused_whole_block(x, temb, in_ch, use_sc)
        if self.updown == "none":
            h = self._gn_conv(x, in_ch, "norm1", "conv1")
        else:
            h = group_norm(x, _auto_groups(in_ch, self.groups), self.eps, "norm1", act=True)
            if self.updown == "down":
                h = fir_downsample(h)
                x = fir_downsample(x)
            elif self.updown == "up":
                h = fir_upsample(h)
                x = fir_upsample(x)
            h = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                param_dtype=jnp.float32, name="conv1",
            )(h)
        t = nn.Dense(self.out_channels, param_dtype=jnp.float32, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t.astype(h.dtype)[:, None, None, :]
        h = self._gn_conv(h, self.out_channels, "norm2", "conv2")
        use_sc = self.use_shortcut
        if use_sc is None:
            use_sc = in_ch != self.out_channels or self.updown != "none"
        if use_sc:
            x = nn.Conv(
                self.out_channels, (1, 1), param_dtype=jnp.float32,
                name="conv_shortcut",
            )(x)
        # NB: scale as a plain python float — an np.float64 scalar is a
        # strong dtype in jax and would silently promote the whole residual
        # stream to fp32 (2x HBM traffic; this bit the NCSN++ sqrt(2) path)
        return (x + h) / float(self.output_scale_factor)


class AttentionBlock(nn.Module):
    """Spatial self-attention over HxW tokens (diffusers AttentionBlock).

    The whole block (GN + QKV + attention + out-proj + residual) routes
    through ops/attention.py::attention_block — ONE fused Pallas kernel on
    the TPU inference shapes, the XLA composition elsewhere.  Param tree is
    byte-identical to the unfused modules (group_norm/{scale,bias},
    query|key|value|proj_attn/{kernel,bias})."""

    groups: Optional[int]
    eps: float
    head_dim: Optional[int] = None
    rescale_output_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        from villandiffusion_tpu.ops.attention import attention_block

        B, H, W, C = x.shape
        n_heads = 1 if self.head_dim is None else max(C // self.head_dim, 1)
        gamma, beta = _Params((C,), nn.initializers.ones, name="group_norm")()
        dense = functools.partial(
            _Params, (C, C), nn.linear.default_kernel_init,
            names=("kernel", "bias"), bias_shape=(C,),
        )
        wq, bq = dense(name="query")()
        wk, bk = dense(name="key")()
        wv, bv = dense(name="value")()
        wo, bo = dense(name="proj_attn")()
        out = attention_block(
            x.reshape(B, H * W, C), gamma, beta,
            wq, bq, wk, bk, wv, bv, wo, bo,
            _auto_groups(C, self.groups), self.eps, n_heads,
            float(self.rescale_output_factor),
        )
        return out.reshape(B, H, W, C)


class Downsample(nn.Module):
    channels: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        if self.padding == 0:
            # diffusers pads (0,1,0,1) when padding==0
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = [(0, 0), (0, 0)]
        else:
            pad = [(self.padding, self.padding)] * 2
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            param_dtype=jnp.float32, name="conv",
        )(x)


class Upsample(nn.Module):
    """nearest-2x upsample followed by a 3x3 conv (diffusers Upsample2D).

    Computed as ONE base-dilated (transposed) convolution: nearest-2x equals
    zero-stuffing convolved with ones(2,2), and convolution is associative,
    so  conv3x3(nearest(x), W) == conv(x, W4, lhs_dilation=2, pad=2)  with
    W4[u,v] = sum_{dy,dx in {0,1}} W[u-dy, v-dx]  (a 4x4 kernel).  XLA:TPU's
    convolution emitter handles base dilation natively (it skips the stuffed
    zeros), so this runs at 4/9 of the naive FLOPs with no upsampled
    intermediate in HBM and no interleave shuffle: 3.5 ms vs 7.9 ms in-scan
    at the up_2 shape (B=512, 16->32 @ C=256, v5e).  Math is exact; param
    tree is identical to the naive path (VILLAN_UPSAMPLE_NAIVE=1 restores
    it)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        import os

        B, H, W, C = x.shape
        F = self.channels
        conv = nn.Conv(
            F, (3, 3), padding=[(1, 1), (1, 1)],
            param_dtype=jnp.float32, name="conv",
        )
        params = self.variables.get("params", {})
        if os.environ.get("VILLAN_UPSAMPLE_NAIVE") == "1" or "conv" not in params:
            # naive path; also taken once at init so the param tree exists
            up = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            return conv(up)
        W3 = params["conv"]["kernel"].astype(jnp.float32)
        bias = params["conv"]["bias"]
        W4 = jnp.zeros((4, 4) + W3.shape[2:], jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                W4 = W4.at[dy:dy + 3, dx:dx + 3].add(W3)
        W4 = W4.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, W4, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


class UNet2D(nn.Module):
    """The denoising UNet. Input/outputs are NHWC.

    ``__call__(x, timesteps)`` where timesteps is (B,) — integer timesteps for
    VP models, sigma values for VE models (the reference calls NCSN++ with
    sigma, /root/reference/loss.py:996-1004).
    """

    config: UNet2DConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        block_out = cfg.block_out_channels
        time_embed_dim = block_out[0] * 4
        groups = cfg.norm_num_groups  # None -> per-block min(ch//4, 32)

        if cfg.center_input_sample:
            x = 2.0 * x - 1.0

        # --- time embedding ---
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        if cfg.time_embedding_type == "positional":
            temb = timestep_embedding(
                timesteps, block_out[0], cfg.flip_sin_to_cos, cfg.freq_shift
            )
        elif cfg.time_embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=block_out[0], name="time_proj"
            )(timesteps)
        else:
            raise NotImplementedError(cfg.time_embedding_type)
        # The sinusoid/Fourier table is built in fp32 for precision, but the
        # MLP and everything downstream must run in the compute dtype: an
        # fp32 temb silently promotes every conv activation to fp32, doubling
        # HBM traffic on a bandwidth-bound model (seen directly in TPU
        # profiles as f32[512,32,32,256] fusion outputs).
        temb = temb.astype(x.dtype)
        temb = nn.Dense(time_embed_dim, param_dtype=jnp.float32, name="time_dense_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(time_embed_dim, param_dtype=jnp.float32, name="time_dense_2")(temb)

        # --- input conv ---
        h = nn.Conv(
            block_out[0], (3, 3), padding=[(1, 1), (1, 1)],
            param_dtype=jnp.float32, name="conv_in",
        )(x)

        skips = [h]
        skip_sample = x  # NCSN++ input pyramid
        # --- down path ---
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = block_out[i]
            is_final = i == len(block_out) - 1
            attn = "Attn" in btype
            is_skip = "Skip" in btype
            scale = np.sqrt(2.0) if is_skip else 1.0
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                    output_scale_factor=scale,
                    name=f"down_{i}_res_{j}",
                )(h, temb)
                if attn:
                    h = AttentionBlock(
                        groups=groups, eps=cfg.norm_eps,
                        head_dim=cfg.attention_head_dim,
                        rescale_output_factor=scale,
                        name=f"down_{i}_attn_{j}",
                    )(h)
                skips.append(h)
            if not is_final:
                if is_skip:
                    # FIR resnet-downsample + 1x1 input-pyramid combiner
                    # (diffusers SkipDownBlock2D / score_sde 'input_skip')
                    h = ResnetBlock(
                        out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                        output_scale_factor=scale, updown="down",
                        name=f"down_{i}_resnet_down",
                    )(h, temb)
                    skip_sample = fir_downsample(skip_sample)
                    h = h + nn.Conv(
                        out_ch, (1, 1),
                        param_dtype=jnp.float32, name=f"down_{i}_skip_conv",
                    )(skip_sample)
                else:
                    h = Downsample(
                        out_ch, padding=cfg.downsample_padding,
                        name=f"down_{i}_downsample",
                    )(h)
                skips.append(h)

        # --- mid ---
        h = ResnetBlock(
            out_channels=block_out[-1], groups=groups, eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor, name="mid_res_0",
        )(h, temb)
        if cfg.add_attention:
            h = AttentionBlock(
                groups=groups, eps=cfg.norm_eps, head_dim=cfg.attention_head_dim,
                rescale_output_factor=cfg.mid_block_scale_factor, name="mid_attn",
            )(h)
        h = ResnetBlock(
            out_channels=block_out[-1], groups=groups, eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor, name="mid_res_1",
        )(h, temb)

        # --- up path ---
        rev_out = list(reversed(block_out))
        out_pyramid = None  # NCSN++ output pyramid (image space)
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev_out[i]
            is_final = i == len(block_out) - 1
            attn = "Attn" in btype
            is_skip = "Skip" in btype
            scale = np.sqrt(2.0) if is_skip else 1.0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(
                    out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                    output_scale_factor=scale,
                    name=f"up_{i}_res_{j}",
                )(h, temb)
                if attn:
                    h = AttentionBlock(
                        groups=groups, eps=cfg.norm_eps,
                        head_dim=cfg.attention_head_dim,
                        rescale_output_factor=scale,
                        name=f"up_{i}_attn_{j}",
                    )(h)
            if is_skip:
                # accumulate the output pyramid at this resolution; the FINAL
                # block contributes through norm_out/conv_out instead (its
                # role as the last skip combine — diffusers SkipUpBlock2D has
                # skip_norm/skip_conv only when add_upsample)
                if out_pyramid is not None:
                    out_pyramid = fir_upsample(out_pyramid)
                if not is_final:
                    s = group_norm(
                        h, _auto_groups(out_ch, groups), cfg.norm_eps,
                        f"up_{i}_skip_norm", act=True,
                    )
                    s = nn.Conv(
                        cfg.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        param_dtype=jnp.float32, name=f"up_{i}_skip_conv",
                    )(s)
                    out_pyramid = s if out_pyramid is None else out_pyramid + s
                    h = ResnetBlock(
                        out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                        output_scale_factor=scale, updown="up",
                        name=f"up_{i}_resnet_up",
                    )(h, temb)
            elif not is_final:
                h = Upsample(out_ch, name=f"up_{i}_upsample")(h)

        # --- out ---
        h = group_norm(h, _auto_groups(h.shape[-1], groups), cfg.norm_eps, "norm_out", act=True)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            param_dtype=jnp.float32, name="conv_out",
        )(h)
        if out_pyramid is not None:
            h = h + out_pyramid
        if cfg.time_embedding_type == "fourier":
            # score parameterization: divide by sigma (diffusers UNet2DModel
            # fourier epilogue); the VE loss supervises -output*sigma
            h = h / timesteps.astype(h.dtype).reshape(
                (-1,) + (1,) * (h.ndim - 1)
            )
        return h

    def init_params(self, rng: jax.Array, batch: int = 1):
        x = jnp.zeros(
            (batch, self.config.sample_size, self.config.sample_size,
             self.config.in_channels),
            jnp.float32,
        )
        t = jnp.zeros((batch,), jnp.int32)
        return jax.jit(self.init)(rng, x, t)
