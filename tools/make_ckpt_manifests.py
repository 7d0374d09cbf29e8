"""Generate key+shape manifests of the pretrained torch checkpoints the
reference fine-tunes, for converter dry-run tests without network egress.

The reference loads these HF hub checkpoints (/root/reference/model.py:906-926,
viallanDiffusion_conditional.py:1226-1248):

  google/ddpm-cifar10-32        UNet2DModel        (DDPM-CIFAR10-32)
  google/ddpm-ema-celebahq-256  UNet2DModel        (DDPM-CELEBA-HQ-256)
  CompVis/ldm-celebahq-256      UNet2DModel + VQModel  (LDM-CELEBA-HQ-256)
  CompVis/stable-diffusion-v1-4 UNet2DConditionModel + AutoencoderKL +
                                CLIPTextModel      (conditional path)

This box has no egress, so the state-dict *key lists and tensor shapes* are
enumerated here from the diffusers module-construction rules (ResnetBlock2D,
AttentionBlock, Transformer2DModel, Encoder/Decoder — the torch source layout
at the reference's pin, install.sh:12-17), NOT from the converters under
test: a layout class the converters forget (e.g. up-resnet conv_shortcuts)
shows up as an unconsumed-key failure, and a key the converters invent shows
up as a missing-leaf/shape mismatch against the flax init tree.  The CLIP
text-encoder manifest is generated from the *real* torch module via
``transformers.CLIPTextModel`` with SD v1's text config.

Usage: python tools/make_ckpt_manifests.py  -> tests/golden/manifests/*.json
Each manifest: {"_config": {...diffusers config.json fields...},
                "keys": {"torch.key": [shape...]}}
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "manifests")

Shape = List[int]
Manifest = Dict[str, Shape]


def _conv(m: Manifest, name: str, ci: int, co: int, k: int = 3) -> None:
    m[name + ".weight"] = [co, ci, k, k]
    m[name + ".bias"] = [co]


def _linear(m: Manifest, name: str, ci: int, co: int, bias: bool = True) -> None:
    m[name + ".weight"] = [co, ci]
    if bias:
        m[name + ".bias"] = [co]


def _norm(m: Manifest, name: str, c: int) -> None:
    m[name + ".weight"] = [c]
    m[name + ".bias"] = [c]


def _resnet(m: Manifest, name: str, ci: int, co: int, temb: int = 0) -> None:
    """diffusers ResnetBlock2D: norm1/conv1/[time_emb_proj]/norm2/conv2 +
    1x1 conv_shortcut iff in/out channels differ."""
    _norm(m, name + ".norm1", ci)
    _conv(m, name + ".conv1", ci, co)
    if temb:
        _linear(m, name + ".time_emb_proj", temb, co)
    _norm(m, name + ".norm2", co)
    _conv(m, name + ".conv2", co, co)
    if ci != co:
        _conv(m, name + ".conv_shortcut", ci, co, k=1)


def _attn_block(m: Manifest, name: str, c: int) -> None:
    """Old-layout diffusers AttentionBlock (pre-`Attention` rename): the
    query/key/value/proj_attn naming the hub .bin checkpoints carry."""
    _norm(m, name + ".group_norm", c)
    for n in ("query", "key", "value", "proj_attn"):
        _linear(m, f"{name}.{n}", c, c)


def unet2d_manifest(cfg: Dict) -> Manifest:
    """diffusers UNet2DModel state_dict (positional time embedding)."""
    m: Manifest = {}
    bo: Tuple[int, ...] = tuple(cfg["block_out_channels"])
    layers = cfg.get("layers_per_block", 2)
    temb = bo[0] * 4
    _linear(m, "time_embedding.linear_1", bo[0], temb)
    _linear(m, "time_embedding.linear_2", temb, temb)
    _conv(m, "conv_in", cfg["in_channels"], bo[0])

    out_ch = bo[0]
    for i, btype in enumerate(cfg["down_block_types"]):
        in_ch, out_ch = out_ch, bo[i]
        for j in range(layers):
            _resnet(m, f"down_blocks.{i}.resnets.{j}",
                    in_ch if j == 0 else out_ch, out_ch, temb)
            if "Attn" in btype:
                _attn_block(m, f"down_blocks.{i}.attentions.{j}", out_ch)
        if i < len(bo) - 1:
            _conv(m, f"down_blocks.{i}.downsamplers.0.conv", out_ch, out_ch)

    _resnet(m, "mid_block.resnets.0", bo[-1], bo[-1], temb)
    if cfg.get("add_attention", True):
        _attn_block(m, "mid_block.attentions.0", bo[-1])
    _resnet(m, "mid_block.resnets.1", bo[-1], bo[-1], temb)

    rev = list(reversed(bo))
    prev = bo[-1]
    for i, btype in enumerate(cfg["up_block_types"]):
        out_ch = rev[i]
        skip_in = rev[min(i + 1, len(bo) - 1)]
        for j in range(layers + 1):
            # diffusers UpBlock2D: resnet input = prev-stage output (j==0)
            # or this stage's width, concatenated with the skip connection
            res_skip = skip_in if j == layers else out_ch
            ci = (prev if j == 0 else out_ch) + res_skip
            _resnet(m, f"up_blocks.{i}.resnets.{j}", ci, out_ch, temb)
            if "Attn" in btype:
                _attn_block(m, f"up_blocks.{i}.attentions.{j}", out_ch)
        if i < len(bo) - 1:
            _conv(m, f"up_blocks.{i}.upsamplers.0.conv", out_ch, out_ch)
        prev = out_ch

    _norm(m, "conv_norm_out", bo[0])
    _conv(m, "conv_out", bo[0], cfg["out_channels"])
    return m


def _transformer2d(m: Manifest, name: str, c: int, xdim: int, depth: int = 1) -> None:
    """diffusers Transformer2DModel, SD-v1 flavor: 1x1-conv proj_in/out,
    BasicTransformerBlock(attn1 self / attn2 cross, GEGLU ff)."""
    _norm(m, name + ".norm", c)
    _conv(m, name + ".proj_in", c, c, k=1)
    for d in range(depth):
        b = f"{name}.transformer_blocks.{d}"
        for attn, kv in (("attn1", c), ("attn2", xdim)):
            _linear(m, f"{b}.{attn}.to_q", c, c, bias=False)
            _linear(m, f"{b}.{attn}.to_k", kv, c, bias=False)
            _linear(m, f"{b}.{attn}.to_v", kv, c, bias=False)
            _linear(m, f"{b}.{attn}.to_out.0", c, c)
        _linear(m, f"{b}.ff.net.0.proj", c, 8 * c)  # GEGLU: 2 * (4c)
        _linear(m, f"{b}.ff.net.2", 4 * c, c)
        for n in ("norm1", "norm2", "norm3"):
            _norm(m, f"{b}.{n}", c)
    _conv(m, name + ".proj_out", c, c, k=1)


def unet2d_condition_manifest(cfg: Dict) -> Manifest:
    """diffusers UNet2DConditionModel state_dict (SD v1 layout)."""
    m: Manifest = {}
    bo: Tuple[int, ...] = tuple(cfg["block_out_channels"])
    layers = cfg.get("layers_per_block", 2)
    xdim = cfg.get("cross_attention_dim", 768)
    temb = bo[0] * 4
    _linear(m, "time_embedding.linear_1", bo[0], temb)
    _linear(m, "time_embedding.linear_2", temb, temb)
    _conv(m, "conv_in", cfg["in_channels"], bo[0])

    out_ch = bo[0]
    for i, btype in enumerate(cfg["down_block_types"]):
        in_ch, out_ch = out_ch, bo[i]
        for j in range(layers):
            _resnet(m, f"down_blocks.{i}.resnets.{j}",
                    in_ch if j == 0 else out_ch, out_ch, temb)
            if "CrossAttn" in btype:
                _transformer2d(m, f"down_blocks.{i}.attentions.{j}", out_ch, xdim)
        if i < len(bo) - 1:
            _conv(m, f"down_blocks.{i}.downsamplers.0.conv", out_ch, out_ch)

    _resnet(m, "mid_block.resnets.0", bo[-1], bo[-1], temb)
    _transformer2d(m, "mid_block.attentions.0", bo[-1], xdim)
    _resnet(m, "mid_block.resnets.1", bo[-1], bo[-1], temb)

    rev = list(reversed(bo))
    prev = bo[-1]
    for i, btype in enumerate(cfg["up_block_types"]):
        out_ch = rev[i]
        skip_in = rev[min(i + 1, len(bo) - 1)]
        for j in range(layers + 1):
            res_skip = skip_in if j == layers else out_ch
            ci = (prev if j == 0 else out_ch) + res_skip
            _resnet(m, f"up_blocks.{i}.resnets.{j}", ci, out_ch, temb)
            if "CrossAttn" in btype:
                _transformer2d(m, f"up_blocks.{i}.attentions.{j}", out_ch, xdim)
        if i < len(bo) - 1:
            _conv(m, f"up_blocks.{i}.upsamplers.0.conv", out_ch, out_ch)
        prev = out_ch

    _norm(m, "conv_norm_out", bo[0])
    _conv(m, "conv_out", bo[0], cfg["out_channels"])
    return m


def _vae_half(m: Manifest, side: str, bo, layers: int, in_c: int, out_c: int) -> None:
    """diffusers VAE Encoder ('encoder') / Decoder ('decoder') halves."""
    if side == "encoder":
        _conv(m, "encoder.conv_in", in_c, bo[0])
        ch = bo[0]
        for i, co in enumerate(bo):
            for j in range(layers):
                _resnet(m, f"encoder.down_blocks.{i}.resnets.{j}", ch, co)
                ch = co
            if i < len(bo) - 1:
                _conv(m, f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
        for tail in ("resnets.0", "resnets.1"):
            _resnet(m, f"encoder.mid_block.{tail}", ch, ch)
        _attn_block(m, "encoder.mid_block.attentions.0", ch)
        _norm(m, "encoder.conv_norm_out", ch)
        _conv(m, "encoder.conv_out", ch, out_c)
    else:
        rev = list(reversed(bo))
        _conv(m, "decoder.conv_in", in_c, rev[0])
        ch = rev[0]
        for tail in ("resnets.0", "resnets.1"):
            _resnet(m, f"decoder.mid_block.{tail}", ch, ch)
        _attn_block(m, "decoder.mid_block.attentions.0", ch)
        for i, co in enumerate(rev):
            for j in range(layers + 1):
                _resnet(m, f"decoder.up_blocks.{i}.resnets.{j}", ch, co)
                ch = co
            if i < len(rev) - 1:
                _conv(m, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
        _norm(m, "decoder.conv_norm_out", ch)
        _conv(m, "decoder.conv_out", ch, out_c)


def vq_manifest(cfg: Dict) -> Manifest:
    """diffusers VQModel (CompVis/ldm-celebahq-256 vqvae: VQ-f4)."""
    m: Manifest = {}
    bo = tuple(cfg["block_out_channels"])
    layers = cfg.get("layers_per_block", 2)
    lat = cfg.get("latent_channels", 3)
    _vae_half(m, "encoder", bo, layers, cfg.get("in_channels", 3), lat)
    _vae_half(m, "decoder", bo, layers, lat, cfg.get("out_channels", 3))
    _conv(m, "quant_conv", lat, lat, k=1)
    _conv(m, "post_quant_conv", lat, lat, k=1)
    m["quantize.embedding.weight"] = [cfg.get("num_vq_embeddings", 8192), lat]
    return m


def kl_manifest(cfg: Dict) -> Manifest:
    """diffusers AutoencoderKL (SD v1 vae: double-z moments head)."""
    m: Manifest = {}
    bo = tuple(cfg["block_out_channels"])
    layers = cfg.get("layers_per_block", 2)
    lat = cfg.get("latent_channels", 4)
    _vae_half(m, "encoder", bo, layers, cfg.get("in_channels", 3), 2 * lat)
    _vae_half(m, "decoder", bo, layers, lat, cfg.get("out_channels", 3))
    _conv(m, "quant_conv", 2 * lat, 2 * lat, k=1)
    _conv(m, "post_quant_conv", lat, lat, k=1)
    return m


def clip_text_manifest() -> Tuple[Dict, Manifest]:
    """SD v1's CLIP text encoder (openai/clip-vit-large-patch14 text tower),
    from the REAL torch module: transformers.CLIPTextModel state_dict."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = dict(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    with torch.device("meta"):
        model = CLIPTextModel(CLIPTextConfig(**cfg))
    return cfg, {k: list(v.shape) for k, v in model.state_dict().items()}


# The hub checkpoints' config.json contents (reference model.py:906-926).
CONFIGS = {
    "ddpm_cifar10_32_unet": dict(
        kind="unet2d", in_channels=3, out_channels=3, sample_size=32,
        block_out_channels=[128, 256, 256, 256],
        down_block_types=["DownBlock2D", "AttnDownBlock2D", "DownBlock2D",
                          "DownBlock2D"],
        up_block_types=["UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D"],
        layers_per_block=2, downsample_padding=0, norm_num_groups=32,
        norm_eps=1e-6, flip_sin_to_cos=False, freq_shift=1,
        time_embedding_type="positional",
    ),
    "ddpm_ema_celebahq_256_unet": dict(
        kind="unet2d", in_channels=3, out_channels=3, sample_size=256,
        block_out_channels=[128, 128, 256, 256, 512, 512],
        down_block_types=["DownBlock2D", "DownBlock2D", "DownBlock2D",
                          "DownBlock2D", "AttnDownBlock2D", "DownBlock2D"],
        up_block_types=["UpBlock2D", "AttnUpBlock2D", "UpBlock2D", "UpBlock2D",
                        "UpBlock2D", "UpBlock2D"],
        layers_per_block=2, downsample_padding=0, norm_num_groups=32,
        norm_eps=1e-6, flip_sin_to_cos=True, freq_shift=0,
        time_embedding_type="positional",
    ),
    "ldm_celebahq_256_unet": dict(
        kind="unet2d", in_channels=3, out_channels=3, sample_size=64,
        block_out_channels=[224, 448, 672, 896],
        down_block_types=["DownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D",
                          "AttnDownBlock2D"],
        up_block_types=["AttnUpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D",
                        "UpBlock2D"],
        layers_per_block=2, downsample_padding=1, norm_num_groups=32,
        norm_eps=1e-6, flip_sin_to_cos=True, freq_shift=0,
        attention_head_dim=32, time_embedding_type="positional",
    ),
    "ldm_celebahq_256_vqvae": dict(
        kind="vq", in_channels=3, out_channels=3, latent_channels=3,
        block_out_channels=[128, 256, 512], layers_per_block=2,
        num_vq_embeddings=8192, sample_size=256,
    ),
    "sd_v1_4_unet": dict(
        kind="unet2d_condition", in_channels=4, out_channels=4, sample_size=64,
        block_out_channels=[320, 640, 1280, 1280],
        down_block_types=["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                          "CrossAttnDownBlock2D", "DownBlock2D"],
        up_block_types=["UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                        "CrossAttnUpBlock2D"],
        layers_per_block=2, cross_attention_dim=768, attention_head_dim=8,
        norm_num_groups=32, norm_eps=1e-5, flip_sin_to_cos=True, freq_shift=0,
    ),
    "sd_v1_4_vae": dict(
        kind="kl", in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=[128, 256, 512, 512], layers_per_block=2,
        sample_size=512, scaling_factor=0.18215,
    ),
}

BUILDERS = {
    "unet2d": unet2d_manifest,
    "unet2d_condition": unet2d_condition_manifest,
    "vq": vq_manifest,
    "kl": kl_manifest,
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, cfg in CONFIGS.items():
        cfg = dict(cfg)
        kind = cfg.pop("kind")
        keys = BUILDERS[kind](cfg)
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump({"_config": cfg, "_kind": kind, "keys": keys}, f, indent=1)
        n_params = sum(int(np.prod(s)) for s in keys.values()) if keys else 0
        print(f"{name}: {len(keys)} tensors, {n_params / 1e6:.1f}M params -> {path}")
    cfg, keys = clip_text_manifest()
    path = os.path.join(OUT_DIR, "sd_v1_4_text_encoder.json")
    with open(path, "w") as f:
        json.dump({"_config": cfg, "_kind": "clip_text", "keys": keys}, f, indent=1)
    print(f"sd_v1_4_text_encoder: {len(keys)} tensors -> {path}")


if __name__ == "__main__":
    import numpy as np

    main()
