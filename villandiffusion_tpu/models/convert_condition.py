"""Convert diffusers PyTorch UNet2DConditionModel checkpoints to Flax params.

The reference fine-tunes SD v1-4/v1-5 UNets via LoRA
(/root/reference/viallanDiffusion_conditional.py:1226-1281); this maps the
torch state_dict of that model (diffusers 0.x SD-v1 layout: Transformer2D
with 1x1-conv proj_in/proj_out, GEGLU ff.net, to_out.0 linear) onto the
villandiffusion_tpu ``UNet2DCondition`` tree.  Attention projections land at
the LoRADense ``base`` leaf; LoRA adapters keep their fresh init (zero
lora_up => converted model is exactly the base model).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from villandiffusion_tpu.models.convert import (
    _convert_conv,
    _convert_linear,
    _convert_norm,
    _convert_resnet,
    _put,
    _t_lin,
)
from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
)


def _convert_proj(tree, sd, tp, fp):
    """Transformer2D proj_in/proj_out: 1x1 Conv2d (SD v1) OR Linear (newer
    use_linear_projection) -> flax Dense."""
    w = sd[tp + ".weight"]
    if w.ndim == 4:  # (O, I, 1, 1) conv1x1
        w = w[:, :, 0, 0]
    _put(tree, fp + ("kernel",), _t_lin(w))
    _put(tree, fp + ("bias",), sd[tp + ".bias"])


def _convert_lora_dense(tree, sd, tp, fp, bias: bool):
    """torch Linear -> LoRADense 'base' leaf (adapters keep fresh init)."""
    _put(tree, fp + ("base", "kernel"), _t_lin(sd[tp + ".weight"]))
    if bias:
        _put(tree, fp + ("base", "bias"), sd[tp + ".bias"])


def _convert_xattn(tree, sd, tp, fp):
    for attn in ("attn1", "attn2"):
        ap = f"{tp}.{attn}"
        _convert_lora_dense(tree, sd, ap + ".to_q", fp + (attn, "to_q"), False)
        _convert_lora_dense(tree, sd, ap + ".to_k", fp + (attn, "to_k"), False)
        _convert_lora_dense(tree, sd, ap + ".to_v", fp + (attn, "to_v"), False)
        _convert_lora_dense(tree, sd, ap + ".to_out.0", fp + (attn, "to_out"), True)
    for norm in ("norm1", "norm2", "norm3"):
        _convert_norm(tree, sd, f"{tp}.{norm}", fp + (norm,))
    _convert_linear(tree, sd, tp + ".ff.net.0.proj", fp + ("ff", "proj_in"))
    _convert_linear(tree, sd, tp + ".ff.net.2", fp + ("ff", "proj_out"))


def _convert_transformer2d(tree, sd, tp, fp, depth: int = 1):
    _convert_norm(tree, sd, tp + ".norm", fp + ("norm",))
    _convert_proj(tree, sd, tp + ".proj_in", fp + ("proj_in",))
    for d in range(depth):
        _convert_xattn(tree, sd, f"{tp}.transformer_blocks.{d}", fp + (f"block_{d}",))
    _convert_proj(tree, sd, tp + ".proj_out", fp + ("proj_out",))


def torch_state_dict_to_flax_condition(
    sd: Dict[str, np.ndarray], config: UNet2DConditionConfig,
    strict: bool = False,
) -> Dict:
    """Build the UNet2DCondition 'params' tree from a diffusers state_dict.

    With config.lora_rank > 0, merge the result over a fresh init via
    ``merge_base_params`` so the adapters exist (zero-initialized up).
    ``strict=True`` asserts every checkpoint tensor was mapped (same
    contract as models/convert.py)."""
    from villandiffusion_tpu.models.convert import _TrackedDict

    sd = _TrackedDict(
        {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    )
    tree: Dict = {}
    _convert_linear(tree, sd, "time_embedding.linear_1", ("time_dense_1",))
    _convert_linear(tree, sd, "time_embedding.linear_2", ("time_dense_2",))
    _convert_conv(tree, sd, "conv_in", ("conv_in",))

    for i, btype in enumerate(config.down_block_types):
        cross = "CrossAttn" in btype
        for j in range(config.layers_per_block):
            _convert_resnet(
                tree, sd, f"down_blocks.{i}.resnets.{j}", (f"down_{i}_res_{j}",)
            )
            if cross:
                _convert_transformer2d(
                    tree, sd, f"down_blocks.{i}.attentions.{j}",
                    (f"down_{i}_attn_{j}",),
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_conv(
                tree, sd, f"down_blocks.{i}.downsamplers.0.conv",
                (f"down_{i}_downsample", "conv"),
            )

    _convert_resnet(tree, sd, "mid_block.resnets.0", ("mid_res_0",))
    _convert_transformer2d(tree, sd, "mid_block.attentions.0", ("mid_attn",))
    _convert_resnet(tree, sd, "mid_block.resnets.1", ("mid_res_1",))

    for i, btype in enumerate(config.up_block_types):
        cross = "CrossAttn" in btype
        for j in range(config.layers_per_block + 1):
            _convert_resnet(
                tree, sd, f"up_blocks.{i}.resnets.{j}", (f"up_{i}_res_{j}",)
            )
            if cross:
                _convert_transformer2d(
                    tree, sd, f"up_blocks.{i}.attentions.{j}", (f"up_{i}_attn_{j}",)
                )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_conv(
                tree, sd, f"up_blocks.{i}.upsamplers.0.conv",
                (f"up_{i}_upsample", "conv"),
            )

    _convert_norm(tree, sd, "conv_norm_out", ("norm_out",))
    _convert_conv(tree, sd, "conv_out", ("conv_out",))
    from villandiffusion_tpu.models.convert import _check_consumed

    _check_consumed(sd, strict)
    return {"params": tree}


def merge_base_params(fresh, converted) -> Dict:
    """Overlay converted base weights onto a fresh init (keeps LoRA leaves)."""
    import copy

    from flax.core import unfreeze

    out = copy.deepcopy(unfreeze(fresh))

    def set_path(tree, keys, val):
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = val

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                set_path(out, path + (k,), v)

    walk(converted, ())
    return out


def config_from_diffusers_json_condition(cfg: Dict) -> UNet2DConditionConfig:
    head_dim = cfg.get("attention_head_dim", 8)
    if not isinstance(head_dim, int):
        raise NotImplementedError(
            "per-block attention_head_dim lists (SD2-style) are not wired yet"
        )
    return UNet2DConditionConfig(
        sample_size=cfg.get("sample_size") or 64,
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_head_dim=head_dim,
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
    )


def load_condition_unet_checkpoint(
    ckpt_dir: str, lora_rank: int = 0
) -> Tuple[UNet2DConditionConfig, Dict]:
    """Load a diffusers-layout UNet2DConditionModel dir -> (config, params).

    With lora_rank > 0 the converted base is overlaid on a fresh LoRA init,
    so the returned params are trainable with the LoRA-only optimizer."""
    import dataclasses

    import jax

    with open(os.path.join(ckpt_dir, "config.json")) as f:
        config = config_from_diffusers_json_condition(json.load(f))
    config = dataclasses.replace(config, lora_rank=lora_rank)
    bin_path = os.path.join(ckpt_dir, "diffusion_pytorch_model.bin")
    st_path = os.path.join(ckpt_dir, "diffusion_pytorch_model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        sd = {
            k: v.detach().cpu().numpy()
            for k, v in torch.load(
                bin_path, map_location="cpu", weights_only=True
            ).items()
        }
    else:
        raise FileNotFoundError(f"No model weights found under {ckpt_dir}")
    converted = torch_state_dict_to_flax_condition(sd, config, strict="warn")
    if lora_rank > 0:
        model = UNet2DCondition(config)
        fresh = jax.tree.map(
            np.asarray, model.init_params(jax.random.PRNGKey(0))
        )
        converted = merge_base_params(fresh, converted)
    return config, converted
