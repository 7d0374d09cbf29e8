"""Convert diffusers-layout PyTorch UNet2DModel checkpoints to Flax params.

The reference fine-tunes HF hub checkpoints (google/ddpm-cifar10-32 etc.,
/root/reference/model.py:906-926).  This module maps a diffusers
``UNet2DModel`` state_dict (old 0.x layout with AttentionBlock
query/key/value/proj_attn) onto the villandiffusion_tpu ``UNet2D`` parameter
tree, transposing torch OIHW conv kernels to Flax HWIO and (out,in) linear
weights to (in,out).

Checkpoints must be on local disk (no network egress in this environment):
``load_unet_checkpoint(dir)`` reads ``<dir>/diffusion_pytorch_model.bin`` (or
``.safetensors``) + ``<dir>/config.json``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from villandiffusion_tpu.models.unet2d import UNet2D, UNet2DConfig


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_lin(w: np.ndarray) -> np.ndarray:
    """torch linear (out, in) -> flax (in, out)."""
    return np.transpose(w, (1, 0))


def _put(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv(tree, sd, torch_prefix, flax_path):
    _put(tree, flax_path + ("kernel",), _t_conv(sd[torch_prefix + ".weight"]))
    _put(tree, flax_path + ("bias",), sd[torch_prefix + ".bias"])


def _convert_linear(tree, sd, torch_prefix, flax_path):
    _put(tree, flax_path + ("kernel",), _t_lin(sd[torch_prefix + ".weight"]))
    _put(tree, flax_path + ("bias",), sd[torch_prefix + ".bias"])


def _convert_norm(tree, sd, torch_prefix, flax_path):
    _put(tree, flax_path + ("scale",), sd[torch_prefix + ".weight"])
    _put(tree, flax_path + ("bias",), sd[torch_prefix + ".bias"])


def _convert_resnet(tree, sd, tp, fp):
    _convert_norm(tree, sd, tp + ".norm1", fp + ("norm1",))
    _convert_conv(tree, sd, tp + ".conv1", fp + ("conv1",))
    _convert_linear(tree, sd, tp + ".time_emb_proj", fp + ("time_emb_proj",))
    _convert_norm(tree, sd, tp + ".norm2", fp + ("norm2",))
    _convert_conv(tree, sd, tp + ".conv2", fp + ("conv2",))
    if tp + ".conv_shortcut.weight" in sd:
        _convert_conv(tree, sd, tp + ".conv_shortcut", fp + ("conv_shortcut",))


def _convert_attn(tree, sd, tp, fp):
    _convert_norm(tree, sd, tp + ".group_norm", fp + ("group_norm",))
    for name in ("query", "key", "value", "proj_attn"):
        _convert_linear(tree, sd, f"{tp}.{name}", fp + (name,))


class _TrackedDict(dict):
    """State-dict wrapper recording which torch keys the conversion read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def torch_state_dict_to_flax(
    sd: Dict[str, np.ndarray], config: UNet2DConfig, strict: bool = False
) -> Dict:
    """Build the UNet2D 'params' tree from a diffusers state_dict.

    Covers the DDPM/LDM block vocabulary AND the NCSN++ skip-block layout
    (Skip*/AttnSkip* blocks with FIR resnet up/down-sampling, 1x1 input-
    pyramid combiners, skip_norm/skip_conv output pyramid, GaussianFourier
    time embedding) used by the reference's VE checkpoints
    (/root/reference/model.py:675-698, fusing/cifar10-ncsnpp-ve layout).

    ``strict=True`` additionally asserts every checkpoint tensor was mapped —
    any unconsumed key means the converter does not understand the layout.
    """
    sd = _TrackedDict(
        {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    )
    tree: Dict = {}
    if config.time_embedding_type == "fourier":
        # GaussianFourierProjection random weight; very old diffusers
        # checkpoints name it `W`, newer `weight`
        w_key = "time_proj.weight" if "time_proj.weight" in sd else "time_proj.W"
        _put(tree, ("time_proj", "weight"), sd[w_key])
    _convert_linear(tree, sd, "time_embedding.linear_1", ("time_dense_1",))
    _convert_linear(tree, sd, "time_embedding.linear_2", ("time_dense_2",))
    _convert_conv(tree, sd, "conv_in", ("conv_in",))

    n_blocks = len(config.block_out_channels)
    for i, btype in enumerate(config.down_block_types):
        attn = "Attn" in btype
        is_skip = "Skip" in btype
        is_final = i == n_blocks - 1
        for j in range(config.layers_per_block):
            _convert_resnet(
                tree, sd, f"down_blocks.{i}.resnets.{j}", (f"down_{i}_res_{j}",)
            )
            if attn:
                _convert_attn(
                    tree, sd, f"down_blocks.{i}.attentions.{j}", (f"down_{i}_attn_{j}",)
                )
        if is_skip and not is_final:
            _convert_resnet(
                tree, sd, f"down_blocks.{i}.resnet_down", (f"down_{i}_resnet_down",)
            )
            _convert_conv(
                tree, sd, f"down_blocks.{i}.skip_conv", (f"down_{i}_skip_conv",)
            )
        elif f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_conv(
                tree,
                sd,
                f"down_blocks.{i}.downsamplers.0.conv",
                (f"down_{i}_downsample", "conv"),
            )

    _convert_resnet(tree, sd, "mid_block.resnets.0", ("mid_res_0",))
    if config.add_attention:
        _convert_attn(tree, sd, "mid_block.attentions.0", ("mid_attn",))
    _convert_resnet(tree, sd, "mid_block.resnets.1", ("mid_res_1",))

    for i, btype in enumerate(config.up_block_types):
        attn = "Attn" in btype
        is_skip = "Skip" in btype
        is_final = i == n_blocks - 1
        for j in range(config.layers_per_block + 1):
            _convert_resnet(
                tree, sd, f"up_blocks.{i}.resnets.{j}", (f"up_{i}_res_{j}",)
            )
            if attn:
                _convert_attn(
                    tree, sd, f"up_blocks.{i}.attentions.{j}", (f"up_{i}_attn_{j}",)
                )
        if is_skip and not is_final:
            _convert_resnet(
                tree, sd, f"up_blocks.{i}.resnet_up", (f"up_{i}_resnet_up",)
            )
            _convert_norm(tree, sd, f"up_blocks.{i}.skip_norm", (f"up_{i}_skip_norm",))
            _convert_conv(tree, sd, f"up_blocks.{i}.skip_conv", (f"up_{i}_skip_conv",))
        elif f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_conv(
                tree, sd, f"up_blocks.{i}.upsamplers.0.conv", (f"up_{i}_upsample", "conv")
            )

    _convert_norm(tree, sd, "conv_norm_out", ("norm_out",))
    _convert_conv(tree, sd, "conv_out", ("conv_out",))
    _check_consumed(sd, strict)
    return {"params": tree}


def _check_consumed(sd: "_TrackedDict", strict) -> None:
    """strict=True raises on unconsumed checkpoint tensors (tests pin full
    consumption against the shipped layout manifests); strict='warn' (the
    checkpoint loaders) logs them instead — benign extras in a real file
    (EMA shadows, non-parameter buffers, a newer diffusers layout) should
    not brick loading, while a key the converter NEEDS still KeyErrors."""
    if not strict:
        return
    leftover = set(sd.keys()) - sd.consumed
    if not leftover:
        return
    msg = (
        f"{len(leftover)} checkpoint tensors not mapped: "
        f"{sorted(leftover)[:8]}..."
    )
    if strict == "warn":
        from villandiffusion_tpu.utils.log import Log

        Log.warning(msg)
    else:
        raise ValueError(msg)


def config_from_diffusers_json(cfg: Dict) -> UNet2DConfig:
    """Map a diffusers UNet2DModel config.json dict to UNet2DConfig."""
    return UNet2DConfig(
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        sample_size=cfg.get("sample_size") or 32,
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        downsample_padding=cfg.get("downsample_padding", 1),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        time_embedding_type=cfg.get("time_embedding_type", "positional"),
        mid_block_scale_factor=cfg.get("mid_block_scale_factor", 1.0),
        attention_head_dim=cfg.get("attention_head_dim"),
        add_attention=cfg.get("add_attention", True),
        center_input_sample=cfg.get("center_input_sample", False),
    )


def load_unet_checkpoint(ckpt_dir: str) -> Tuple[UNet2DConfig, Dict]:
    """Load a diffusers-layout UNet directory -> (config, flax params)."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        config = config_from_diffusers_json(json.load(f))
    bin_path = os.path.join(ckpt_dir, "diffusion_pytorch_model.bin")
    st_path = os.path.join(ckpt_dir, "diffusion_pytorch_model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        sd = {
            k: v.detach().cpu().numpy()
            for k, v in torch.load(bin_path, map_location="cpu", weights_only=True).items()
        }
    else:
        raise FileNotFoundError(f"No model weights found under {ckpt_dir}")
    return config, torch_state_dict_to_flax(sd, config, strict="warn")
