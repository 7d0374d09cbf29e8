"""End-to-end local SD checkpoint loading: synthesized diffusers-layout
torch dirs (unet/, vae/, text_encoder/) -> build_stack -> one train step +
one sampling call.  Proves the no-network local-checkpoint path works."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_convert_condition import _synth_state_dict
from villandiffusion_tpu.models.unet2d_condition import UNet2DConditionConfig


def _save_torch(sd, path):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)


def _synth_vae_sd(bo, layers, latent, rng):
    sd = {}

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.standard_normal(o).astype(np.float32) * 0.05

    def norm(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)

    def lin(name, i, o):
        sd[name + ".weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.05
        sd[name + ".bias"] = np.zeros(o, np.float32)

    def resnet(name, ci, co):
        norm(name + ".norm1", ci)
        conv(name + ".conv1", ci, co)
        norm(name + ".norm2", co)
        conv(name + ".conv2", co, co)
        if ci != co:
            conv(name + ".conv_shortcut", ci, co, k=1)

    def attn(name, c):
        norm(name + ".group_norm", c)
        for n in ("query", "key", "value", "proj_attn"):
            lin(f"{name}.{n}", c, c)

    # encoder
    conv("encoder.conv_in", 3, bo[0])
    ch = bo[0]
    for i, co in enumerate(bo):
        for j in range(layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, co)
            ch = co
        if i < len(bo) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * latent)
    # decoder
    rev = list(reversed(bo))
    conv("decoder.conv_in", latent, rev[0])
    ch = rev[0]
    resnet("decoder.mid_block.resnets.0", ch, ch)
    attn("decoder.mid_block.attentions.0", ch)
    resnet("decoder.mid_block.resnets.1", ch, ch)
    for i, co in enumerate(rev):
        for j in range(layers + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, co)
            ch = co
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, 3)
    conv("quant_conv", 2 * latent, 2 * latent, k=1)
    conv("post_quant_conv", latent, latent, k=1)
    return sd


@pytest.fixture(scope="module")
def sd_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sd_ckpt"))
    rng = np.random.default_rng(0)
    cfg = UNet2DConditionConfig.tiny()
    # unet/
    unet_dir = os.path.join(root, "unet"); os.makedirs(unet_dir)
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump({
            "sample_size": cfg.sample_size,
            "in_channels": cfg.in_channels,
            "out_channels": cfg.out_channels,
            "block_out_channels": list(cfg.block_out_channels),
            "down_block_types": list(cfg.down_block_types),
            "up_block_types": list(cfg.up_block_types),
            "layers_per_block": cfg.layers_per_block,
            "cross_attention_dim": cfg.cross_attention_dim,
            "attention_head_dim": cfg.attention_head_dim,
            "norm_num_groups": cfg.norm_num_groups,
        }, f)
    usd = {k: v * 0.05 for k, v in _synth_state_dict(cfg, rng).items()}
    _save_torch(usd, os.path.join(unet_dir, "diffusion_pytorch_model.bin"))
    # vae/
    vae_dir = os.path.join(root, "vae"); os.makedirs(vae_dir)
    bo, layers, latent = (8, 16), 1, 4
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump({
            "block_out_channels": list(bo), "layers_per_block": layers,
            "in_channels": 3, "out_channels": 3, "latent_channels": latent,
            "scaling_factor": 0.18215,
        }, f)
    _save_torch(
        _synth_vae_sd(bo, layers, latent, rng),
        os.path.join(vae_dir, "diffusion_pytorch_model.bin"),
    )
    # text_encoder/ via transformers torch CLIPTextModel
    from transformers import CLIPTextConfig, CLIPTextModel

    tc = CLIPTextConfig(
        vocab_size=49408, hidden_size=cfg.cross_attention_dim,
        intermediate_size=cfg.cross_attention_dim * 4, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77,
    )
    CLIPTextModel(tc).save_pretrained(os.path.join(root, "text_encoder"))
    return root


def test_build_stack_from_local_checkpoint(sd_dir):
    from villandiffusion_tpu import cli_conditional as CC

    args = CC.build_parser().parse_args([
        "--mode", "train", "--pretrained_model_name_or_path", sd_dir,
        "--dataset_name", "FAKE-CAPTION", "--resolution", "16",
        "--caption_trigger", "TRIGGER_SKS", "--target", "CORNER",
        "--lora_r", "2", "--train_batch_size", "2", "--max_train_steps", "1",
        "--num_fake", "4", "--seed", "0",
    ])
    stack = CC.build_stack(args)
    # tiny VAE has 2 levels -> spatial /2 (real SD: 4 levels -> /8)
    assert stack.latent_size == 8
    x = jnp.zeros((2, 16, 16, 3))
    z = stack.vae.encode(x)
    assert z.shape == (2, 8, 8, 4)
    assert bool(jnp.isfinite(z).all())
    # text encoder works with the hash tokenizer ids
    ids = jnp.asarray(stack.tokenizer(["a photo of a cat"])["input_ids"])
    emb = stack.text.encode(ids)
    assert emb.shape[-1] == 32 and bool(jnp.isfinite(emb).all())
    # unet forward on latents
    y = stack.unet.apply(stack.params, z, jnp.zeros((2,), jnp.int32),
                         jnp.broadcast_to(emb, (2,) + emb.shape[1:]))
    assert y.shape == z.shape and bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_train_one_step_from_local_checkpoint(sd_dir, tmp_path):
    from villandiffusion_tpu import cli_conditional as CC

    out = str(tmp_path / "run")
    CC.main([
        "--mode", "train", "--pretrained_model_name_or_path", sd_dir,
        "--dataset_name", "FAKE-CAPTION", "--resolution", "16",
        "--caption_trigger", "TRIGGER_SKS", "--target", "CORNER",
        "--lora_r", "2", "--train_batch_size", "2", "--max_train_steps", "1",
        "--checkpointing_steps", "1", "--num_fake", "4", "--seed", "0",
        "--output_dir", out,
    ])
    assert os.path.exists(os.path.join(out, "lora_weights.npz"))
    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert losses and all(np.isfinite(losses))
