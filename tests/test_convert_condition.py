"""UNet2DCondition torch->flax converter: tree-structure + placement checks.

diffusers isn't installed in this environment, so the torch-side naming is
synthesized here following the diffusers 0.x SD-v1 UNet2DConditionModel
layout; the tests validate that the converter emits a tree that is
structurally identical to the flax model's init and that weights land
transposed in the right leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.models.convert_condition import (
    merge_base_params,
    torch_state_dict_to_flax_condition,
)
from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
)


def _synth_state_dict(cfg: UNet2DConditionConfig, rng):
    """Random torch-layout state dict for the given config."""
    sd = {}

    def lin(name, i, o, bias=True):
        sd[name + ".weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal(o).astype(np.float32)

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(o).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32)

    def resnet(name, ci, co):
        norm(name + ".norm1", ci)
        conv(name + ".conv1", ci, co)
        lin(name + ".time_emb_proj", cfg.block_out_channels[0] * 4, co)
        norm(name + ".norm2", co)
        conv(name + ".conv2", co, co)
        if ci != co:
            conv(name + ".conv_shortcut", ci, co, k=1)

    def xformer(name, c):
        norm(name + ".norm", c)
        conv(name + ".proj_in", c, c, k=1)
        tb = name + ".transformer_blocks.0"
        for attn, ctx in ((".attn1", c), (".attn2", cfg.cross_attention_dim)):
            lin(tb + attn + ".to_q", c, c, bias=False)
            lin(tb + attn + ".to_k", ctx, c, bias=False)
            lin(tb + attn + ".to_v", ctx, c, bias=False)
            lin(tb + attn + ".to_out.0", c, c)
        for n in (".norm1", ".norm2", ".norm3"):
            norm(tb + n, c)
        lin(tb + ".ff.net.0.proj", c, c * 8)
        lin(tb + ".ff.net.2", c * 4, c)
        conv(name + ".proj_out", c, c, k=1)

    bo = cfg.block_out_channels
    t = bo[0] * 4
    lin("time_embedding.linear_1", bo[0], t)
    lin("time_embedding.linear_2", t, t)
    conv("conv_in", cfg.in_channels, bo[0])

    ch = bo[0]
    skips = [bo[0]]
    for i, btype in enumerate(cfg.down_block_types):
        co = bo[i]
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", ch, co)
            if "CrossAttn" in btype:
                xformer(f"down_blocks.{i}.attentions.{j}", co)
            ch = co
            skips.append(ch)
        if i != len(bo) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", ch, ch)
            skips.append(ch)
    resnet("mid_block.resnets.0", ch, ch)
    xformer("mid_block.attentions.0", ch)
    resnet("mid_block.resnets.1", ch, ch)
    rev = list(reversed(bo))
    for i, btype in enumerate(cfg.up_block_types):
        co = rev[i]
        for j in range(cfg.layers_per_block + 1):
            resnet(f"up_blocks.{i}.resnets.{j}", ch + skips.pop(), co)
            if "CrossAttn" in btype:
                xformer(f"up_blocks.{i}.attentions.{j}", co)
            ch = co
        if i != len(bo) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("conv_norm_out", ch)
    conv("conv_out", ch, cfg.out_channels)
    return sd


@pytest.fixture(scope="module")
def cfg():
    return UNet2DConditionConfig.tiny(lora_rank=0)


def test_tree_structure_matches_flax_init(cfg):
    rng = np.random.default_rng(0)
    sd = _synth_state_dict(cfg, rng)
    converted = torch_state_dict_to_flax_condition(sd, cfg)
    model = UNet2DCondition(cfg)
    fresh = model.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(converted) == jax.tree.structure(
        jax.tree.map(np.asarray, fresh)
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(converted)[0],
        jax.tree_util.tree_flatten_with_path(fresh)[0],
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_placement_and_transposes(cfg):
    rng = np.random.default_rng(1)
    sd = _synth_state_dict(cfg, rng)
    tree = torch_state_dict_to_flax_condition(sd, cfg)["params"]
    np.testing.assert_array_equal(
        tree["conv_in"]["kernel"], np.transpose(sd["conv_in.weight"], (2, 3, 1, 0))
    )
    np.testing.assert_array_equal(
        tree["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["base"]["kernel"],
        sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].T,
    )
    np.testing.assert_array_equal(
        tree["down_0_attn_0"]["proj_in"]["kernel"],
        sd["down_blocks.0.attentions.0.proj_in.weight"][:, :, 0, 0].T,
    )


def test_converted_params_run_forward(cfg):
    rng = np.random.default_rng(2)
    sd = _synth_state_dict(cfg, rng)
    sd = {k: v * 0.02 for k, v in sd.items()}
    params = torch_state_dict_to_flax_condition(sd, cfg)
    model = UNet2DCondition(cfg)
    x = jnp.zeros((2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    y = model.apply(params, x, t, ctx)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_lora_merge_keeps_adapters_and_base_behaviour(cfg):
    import dataclasses

    rng = np.random.default_rng(3)
    sd = {k: v * 0.02 for k, v in _synth_state_dict(cfg, rng).items()}
    cfg_l = dataclasses.replace(cfg, lora_rank=2)
    model = UNet2DCondition(cfg_l)
    fresh = jax.tree.map(np.asarray, model.init_params(jax.random.PRNGKey(0)))
    converted = torch_state_dict_to_flax_condition(sd, cfg_l)
    merged = merge_base_params(fresh, converted)
    # lora_up zero-init => merged model == plain converted base model
    plain = UNet2DCondition(dataclasses.replace(cfg, lora_rank=0))
    p0 = torch_state_dict_to_flax_condition(sd, cfg)
    x = jnp.asarray(rng.standard_normal((1, cfg.sample_size, cfg.sample_size, cfg.in_channels)), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, cfg.cross_attention_dim)), jnp.float32)
    y_lora = model.apply(merged, x, t, ctx)
    y_base = plain.apply(p0, x, t, ctx)
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_base), atol=1e-5)
