"""Flax UNet2DCondition (Stable-Diffusion v1 family) with built-in LoRA.

Mirrors the diffusers UNet2DConditionModel graph the reference fine-tunes
(/root/reference/viallanDiffusion_conditional.py:1226-1281): CrossAttn
down/up blocks with Transformer2D layers (self-attn + text cross-attn +
GEGLU FF), SD v1-4 config preset.

LoRA: every attention projection (q/k/v/out) optionally carries a rank-r
low-rank adapter (diffusers LoRAAttnProcessor semantics, wired by the
reference at viallanDiffusion_conditional.py:1206-1223).  Adapter params
live under ``lora_down``/``lora_up`` module names so the optimizer can mask
everything else out (train-LoRA-only), and ``split_lora_params`` /
``merge_lora_params`` give checkpoint-sized artifacts (the reference saves
attn-proc-only dirs, :1776-1794).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from villandiffusion_tpu.models.unet2d import (
    ResnetBlock,
    Downsample,
    Upsample,
    group_norm,
    timestep_embedding,
)
from villandiffusion_tpu.ops.attention import spatial_attention, xla_attention


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # number of heads (SD v1 convention)
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    lora_rank: int = 0  # 0 = plain; >0 = add rank-r adapters on attn q/k/v/out

    @classmethod
    def sd_v1(cls, lora_rank: int = 0) -> "UNet2DConditionConfig":
        return cls(lora_rank=lora_rank)

    @classmethod
    def mid(cls, lora_rank: int = 0) -> "UNet2DConditionConfig":
        """Mid-size stack with the REAL SD v1 block topology (3 CrossAttn +
        1 plain down block, mirrored up, layers_per_block=2) at reduced
        widths — the LoRA-on-pretrained-backbone realism rig
        (tools/parity_cond_lora.py): big enough for a backbone to acquire a
        prompt->image prior, small enough to pretrain offline."""
        return cls(
            sample_size=16,
            in_channels=4,
            out_channels=4,
            block_out_channels=(64, 128, 256, 256),
            layers_per_block=2,
            cross_attention_dim=256,
            attention_head_dim=4,
            norm_num_groups=32,
            lora_rank=lora_rank,
        )

    @classmethod
    def tiny(cls, lora_rank: int = 0) -> "UNet2DConditionConfig":
        """Smoke-test scale."""
        return cls(
            sample_size=8,
            in_channels=4,
            out_channels=4,
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=2,
            norm_num_groups=8,
            lora_rank=lora_rank,
        )


class LoRADense(nn.Module):
    features: int
    rank: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.features, use_bias=self.use_bias,
            param_dtype=jnp.float32, name="base",
        )(x)
        if self.rank > 0:
            down = nn.Dense(
                self.rank, use_bias=False, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(1.0 / self.rank),
                name="lora_down",
            )(x)
            up = nn.Dense(
                self.features, use_bias=False, param_dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, name="lora_up",
            )(down)
            y = y + up
        return y


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # None -> self-attention
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = LoRADense(inner, self.lora_rank, name="to_q")(x)
        k = LoRADense(inner, self.lora_rank, name="to_k")(ctx)
        v = LoRADense(inner, self.lora_rank, name="to_v")(ctx)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        hd = self.dim_head

        if context is None and Tq == Tk and hd % 8 == 0 and Tq % 8 == 0:
            # Self-attention over spatial tokens: route through the Pallas
            # dispatch (flash kernel at T>=4096).  The five 64x64 (T=4096)
            # self-attn blocks are 40% of the SD UNet eval as plain XLA
            # softmax fusions (~10.5 ms each, batch 16 on v5e); the
            # KV-streaming kernel keeps the 4096^2 logits in VMEM.
            # Cross-attention (Tk=77, ragged) stays on the XLA path.
            out = spatial_attention(q, k, v, self.heads)
            return LoRADense(
                self.query_dim, self.lora_rank, use_bias=True, name="to_out"
            )(out)

        def split(t, T):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, Tq), split(k, Tk), split(v, Tk)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, inner)
        return LoRADense(self.query_dim, self.lora_rank, use_bias=True, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        # GEGLU
        h = nn.Dense(self.dim * 8, param_dtype=jnp.float32, name="proj_in")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g)
        return nn.Dense(self.dim, param_dtype=jnp.float32, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(param_dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, None, self.lora_rank, name="attn1"
        )(h)
        h = nn.LayerNorm(param_dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, self.context_dim, self.lora_rank,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(param_dtype=jnp.float32, name="norm3")(x)
        return x + FeedForward(self.dim, name="ff")(h)


class Transformer2D(nn.Module):
    channels: int
    heads: int
    dim_head: int
    context_dim: int
    groups: int
    lora_rank: int = 0
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = group_norm(x, self.groups, 1e-6, "norm")
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.channels, param_dtype=jnp.float32, name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, self.dim_head, self.context_dim,
                self.lora_rank, name=f"block_{d}",
            )(h, context)
        h = nn.Dense(self.channels, param_dtype=jnp.float32, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class UNet2DCondition(nn.Module):
    config: UNet2DConditionConfig

    @nn.compact
    def __call__(self, x, timesteps, encoder_hidden_states):
        cfg = self.config
        block_out = cfg.block_out_channels
        time_embed_dim = block_out[0] * 4
        groups = cfg.norm_num_groups
        heads = cfg.attention_head_dim
        ctx = encoder_hidden_states

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        temb = timestep_embedding(
            timesteps, block_out[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = nn.Dense(time_embed_dim, param_dtype=jnp.float32, name="time_dense_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(time_embed_dim, param_dtype=jnp.float32, name="time_dense_2")(temb)

        h = nn.Conv(block_out[0], (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name="conv_in")(x)
        skips = [h]

        def xattn(ch, name):
            return Transformer2D(
                ch, heads, ch // heads, cfg.cross_attention_dim, groups,
                cfg.lora_rank, name=name,
            )

        for i, btype in enumerate(cfg.down_block_types):
            out_ch = block_out[i]
            is_final = i == len(block_out) - 1
            cross = "CrossAttn" in btype
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                    name=f"down_{i}_res_{j}",
                )(h, temb)
                if cross:
                    h = xattn(out_ch, f"down_{i}_attn_{j}")(h, ctx)
                skips.append(h)
            if not is_final:
                h = Downsample(out_ch, padding=1, name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = ResnetBlock(
            out_channels=block_out[-1], groups=groups, eps=cfg.norm_eps,
            name="mid_res_0",
        )(h, temb)
        h = xattn(block_out[-1], "mid_attn")(h, ctx)
        h = ResnetBlock(
            out_channels=block_out[-1], groups=groups, eps=cfg.norm_eps,
            name="mid_res_1",
        )(h, temb)

        rev_out = list(reversed(block_out))
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev_out[i]
            is_final = i == len(block_out) - 1
            cross = "CrossAttn" in btype
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(
                    out_channels=out_ch, groups=groups, eps=cfg.norm_eps,
                    name=f"up_{i}_res_{j}",
                )(h, temb)
                if cross:
                    h = xattn(out_ch, f"up_{i}_attn_{j}")(h, ctx)
            if not is_final:
                h = Upsample(out_ch, name=f"up_{i}_upsample")(h)

        h = group_norm(h, groups, cfg.norm_eps, "norm_out")
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       param_dtype=jnp.float32, name="conv_out")(h)

    def init_params(self, rng: jax.Array, batch: int = 1, text_len: int = 77):
        cfg = self.config
        x = jnp.zeros((batch, cfg.sample_size, cfg.sample_size, cfg.in_channels))
        t = jnp.zeros((batch,), jnp.int32)
        ctx = jnp.zeros((batch, text_len, cfg.cross_attention_dim))
        return jax.jit(self.init)(rng, x, t, ctx)


# ---------------------------------------------------------------------------
# LoRA parameter handling
# ---------------------------------------------------------------------------


def is_lora_path(path: Tuple[str, ...]) -> bool:
    return any(p in ("lora_down", "lora_up") for p in path)


def lora_mask(params) -> dict:
    """Pytree of bools marking LoRA params (True = trainable)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    import jax.tree_util as jtu

    def mark(path, _):
        keys = tuple(
            k.key if isinstance(k, jtu.DictKey) else str(k) for k in path
        )
        return is_lora_path(keys)

    return jax.tree_util.tree_map_with_path(mark, params)


def split_lora_params(params):
    """-> (base_tree_with_zeros_removed? no: base, lora) as two trees of the
    same structure with None in the other's positions is awkward in JAX;
    instead return a flat {path: array} dict of only LoRA leaves."""
    import jax.tree_util as jtu

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(k.key if isinstance(k, jtu.DictKey) else str(k) for k in path)
        if is_lora_path(keys):
            out["/".join(keys)] = np.asarray(leaf)
    return out


def split_all_params(params):
    """Flat {path: array} dict of EVERY leaf (full-finetune checkpoints;
    merge_lora_params writes any flat path dict back into the tree)."""
    import jax.tree_util as jtu

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(k.key if isinstance(k, jtu.DictKey) else str(k) for k in path)
        out["/".join(keys)] = np.asarray(leaf)
    return out


def merge_lora_params(params, lora_flat: dict):
    """Write a flat {path: array} LoRA dict back into a full param tree.

    Shape-mismatched entries are SKIPPED (with a warning), not written:
    loading a full-finetune export whose LoRA matrices were rank r into a
    model built at a different rank must inherit every backbone weight and
    keep the new model's fresh LoRA — blind writes would poison the tree
    with wrong-shaped leaves that only explode later at trace time.
    """
    params = unfreeze(params) if hasattr(params, "unfreeze") else dict(params)

    def get_path(tree, keys):
        node = tree
        for k in keys:
            node = node[k]
        return node

    def set_path(tree, keys, val):
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = jnp.asarray(val)

    import copy

    out = copy.deepcopy(jax.tree.map(lambda a: a, params))
    skipped = []
    for path, val in lora_flat.items():
        keys = tuple(path.split("/"))
        try:
            cur = get_path(out, keys)
        except (KeyError, TypeError):
            cur = None
        if cur is not None and tuple(cur.shape) != tuple(val.shape):
            skipped.append(path)
            continue
        set_path(out, keys, val)
    if skipped:
        from villandiffusion_tpu.utils.log import Log

        Log.warning(
            f"merge_lora_params: skipped {len(skipped)} shape-mismatched "
            f"entries (e.g. {skipped[0]}) — cross-rank init keeps the "
            "model's own fresh LoRA for those"
        )
    return out
