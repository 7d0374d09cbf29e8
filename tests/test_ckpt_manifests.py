"""Converter dry-runs against the real hub checkpoints' key+shape layouts.

The environment has no network egress, so real weights can't be fetched —
but the converters' risk is structural (does every checkpoint tensor map,
and does the produced tree exactly match the flax model's parameter tree?),
which keys + shapes settle.  ``tests/golden/manifests/*.json`` hold the
state-dict layouts of the checkpoints the reference fine-tunes
(/root/reference/model.py:906-926), enumerated by
``tools/make_ckpt_manifests.py`` from the diffusers torch module rules —
independently of models/convert*.py.  Per-tensor totals match the published
parameter counts (ddpm-cifar10 35.7M, sd-v1-4 unet 859.5M, vae 83.7M, ...).

Each test synthesizes a zero state dict at the real shapes, converts with
strict full-key consumption, and asserts the output tree's (path, shape) set
equals ``jax.eval_shape`` of the flax model's init — both directions: an
unconsumed torch key, a missing flax leaf, or any shape mismatch fails.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "golden", "manifests")


def _load(name):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        data = json.load(f)
    sd = {k: np.zeros(shape, np.float32) for k, shape in data["keys"].items()}
    return data["_config"], sd


def _leaf_shapes(tree, path=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_shapes(v, path + (k,)))
        else:
            out[path + (k,)] = tuple(v.shape)
    return out


def _assert_tree_match(got, want, what):
    got, want = _leaf_shapes(got), _leaf_shapes(want)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{what}: converter missed {len(missing)} leaves: {missing[:6]}"
    assert not extra, f"{what}: converter invented {len(extra)} leaves: {extra[:6]}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{what}: shape mismatches: {dict(list(bad.items())[:6])}"


class TestUNet2DManifests:
    # the flagship layout stays in the fast gate; the big 256px layouts
    # (100M+ zero tensors each) run in the slow tier
    @pytest.mark.parametrize(
        "name",
        ["ddpm_cifar10_32_unet",
         pytest.param("ddpm_ema_celebahq_256_unet", marks=pytest.mark.slow),
         pytest.param("ldm_celebahq_256_unet", marks=pytest.mark.slow)],
    )
    def test_full_consumption_and_tree_parity(self, name):
        from villandiffusion_tpu.models.convert import (
            config_from_diffusers_json,
            torch_state_dict_to_flax,
        )
        from villandiffusion_tpu.models.unet2d import UNet2D

        cfg_json, sd = _load(name)
        config = config_from_diffusers_json(cfg_json)
        params = torch_state_dict_to_flax(sd, config, strict=True)

        model = UNet2D(config)
        x = jnp.zeros((1, config.sample_size, config.sample_size,
                       config.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
        _assert_tree_match(params, want, name)


@pytest.mark.slow
class TestSDv14UNetManifest:
    def test_full_consumption_and_tree_parity(self):
        from villandiffusion_tpu.models.convert_condition import (
            config_from_diffusers_json_condition,
            torch_state_dict_to_flax_condition,
        )
        from villandiffusion_tpu.models.unet2d_condition import UNet2DCondition

        cfg_json, sd = _load("sd_v1_4_unet")
        config = config_from_diffusers_json_condition(cfg_json)
        params = torch_state_dict_to_flax_condition(sd, config, strict=True)

        model = UNet2DCondition(config)
        x = jnp.zeros((1, config.sample_size, config.sample_size,
                       config.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, config.cross_attention_dim))
        want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
        # the converter fills base weights only; LoRA adapters (lora_rank=0
        # here) are absent from both trees
        _assert_tree_match(params, want, "sd_v1_4_unet")

    def test_lora_merge_keeps_adapters(self):
        """With lora_rank>0 the converted base overlays a fresh init: every
        base leaf comes from the checkpoint, every lora leaf survives."""
        import dataclasses

        from villandiffusion_tpu.models.convert_condition import (
            config_from_diffusers_json_condition,
            merge_base_params,
            torch_state_dict_to_flax_condition,
        )
        from villandiffusion_tpu.models.unet2d_condition import UNet2DCondition

        cfg_json, sd = _load("sd_v1_4_unet")
        config = dataclasses.replace(
            config_from_diffusers_json_condition(cfg_json), lora_rank=4
        )
        converted = torch_state_dict_to_flax_condition(sd, config, strict=True)
        model = UNet2DCondition(config)
        x = jnp.zeros((1, 64, 64, 4))
        fresh = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768)),
        )
        fresh_shapes = _leaf_shapes(fresh)
        conv_shapes = _leaf_shapes(converted)
        lora = {k for k in fresh_shapes if any("lora" in p for p in k)}
        assert len(lora) > 0
        assert set(conv_shapes) == set(fresh_shapes) - lora
        for k in conv_shapes:
            assert conv_shapes[k] == fresh_shapes[k], k


class TestVAEManifests:
    def test_vq_f4(self):
        from villandiffusion_tpu.models.vae import (
            VQModelFlax,
            _convert_vq_state_dict,
        )

        cfg_json, sd = _load("ldm_celebahq_256_vqvae")
        model = VQModelFlax(
            block_out_channels=tuple(cfg_json["block_out_channels"]),
            layers_per_block=cfg_json["layers_per_block"],
            latent_channels=cfg_json["latent_channels"],
            num_vq_embeddings=cfg_json["num_vq_embeddings"],
        )
        params = _convert_vq_state_dict(sd, model, strict=True)
        x = jnp.zeros((1, 64, 64, 3))
        want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        _assert_tree_match(params, want, "ldm_celebahq_256_vqvae")

    def test_sd_kl(self):
        from villandiffusion_tpu.models.vae import (
            AutoencoderKLFlax,
            _convert_vq_state_dict,
        )

        cfg_json, sd = _load("sd_v1_4_vae")
        model = AutoencoderKLFlax(
            block_out_channels=tuple(cfg_json["block_out_channels"]),
            layers_per_block=cfg_json["layers_per_block"],
            latent_channels=cfg_json["latent_channels"],
        )
        params = _convert_vq_state_dict(sd, model, has_codebook=False,
                                        strict=True)
        x = jnp.zeros((1, 64, 64, 3))
        want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        _assert_tree_match(params, want, "sd_v1_4_vae")


@pytest.mark.slow
def test_text_encoder_from_real_scale_checkpoint(tmp_path):
    """Write a zero torch checkpoint with SD v1's real CLIP text layout
    (manifest generated from the actual transformers torch module) and load
    it through the product path (FlaxCLIPTextModel.from_pt)."""
    import torch

    from villandiffusion_tpu.models.text import load_text_encoder

    cfg_json, sd = _load("sd_v1_4_text_encoder")
    te_dir = tmp_path / "text_encoder"
    te_dir.mkdir()
    from transformers import CLIPTextConfig

    CLIPTextConfig(**cfg_json).save_pretrained(te_dir)
    torch.save(
        {k: torch.from_numpy(v) for k, v in sd.items()},
        te_dir / "pytorch_model.bin",
    )
    bundle = load_text_encoder(str(tmp_path))
    assert bundle.hidden_size == 768
    emb = bundle.encode(jnp.zeros((1, 77), jnp.int32))
    assert emb.shape == (1, 77, 768)
