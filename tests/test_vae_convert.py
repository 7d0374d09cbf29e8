"""VQModel / AutoencoderKL torch->flax converter roundtrip (structural
verification against a synthesized diffusers-layout state_dict; the real
CompVis/ldm-celebahq-256 vqvae and SD-v1 vae follow this exact key
vocabulary — /root/reference/model.py:706-776)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.models.vae import (
    AutoencoderKLFlax,
    VQModelFlax,
    _convert_vq_state_dict,
)


def _vae_flax_to_torch_sd(params, has_codebook=True):
    """Inverse mapping (test-only): flax VAE tree -> diffusers keys."""
    sd = {}

    def emit(tpath, leaf, arr):
        arr = np.asarray(arr)
        if leaf == "kernel" and arr.ndim == 4:
            sd[tpath + ".weight"] = np.transpose(arr, (3, 2, 0, 1))
        elif leaf == "kernel":
            sd[tpath + ".weight"] = np.transpose(arr, (1, 0))
        elif leaf == "scale":
            sd[tpath + ".weight"] = arr
        else:
            sd[tpath + ".bias"] = arr

    def torch_name(side, mod):
        if mod == "conv_in":
            return f"{side}.conv_in"
        if mod == "conv_out":
            return f"{side}.conv_out"
        if mod == "norm_out":
            return f"{side}.conv_norm_out"
        if mod.startswith("mid_res_"):
            return f"{side}.mid_block.resnets.{mod[-1]}"
        if mod == "mid_attn":
            return f"{side}.mid_block.attentions.0"
        parts = mod.split("_")  # down_{i}_res_{j} / down_{i}_downsample / up_*
        kind, i = parts[0], parts[1]
        blocks = "down_blocks" if kind == "down" else "up_blocks"
        if parts[2] == "res":
            return f"{side}.{blocks}.{i}.resnets.{parts[3]}"
        if parts[2] == "downsample":
            return f"{side}.{blocks}.{i}.downsamplers.0.conv"
        if parts[2] == "upsample":
            return f"{side}.{blocks}.{i}.upsamplers.0.conv"
        raise KeyError(mod)

    def walk(node, tprefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, f"{tprefix}.{k}")
            else:
                emit(tprefix, k, v)

    p = params["params"]
    for side in ("encoder", "decoder"):
        for mod, sub in p[side].items():
            walk(sub, torch_name(side, mod))
    walk(p["quant_conv"], "quant_conv")
    walk(p["post_quant_conv"], "post_quant_conv")
    if has_codebook:
        sd["quantize.embedding.weight"] = np.asarray(p["codebook"])
    return sd


class TestVQConverterRoundtrip:
    def _model_params(self):
        model = VQModelFlax(
            block_out_channels=(8, 16), layers_per_block=1,
            latent_channels=3, num_vq_embeddings=16,
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        return model, params

    def test_roundtrip_exact_and_strict(self):
        model, params = self._model_params()
        sd = _vae_flax_to_torch_sd(params)
        # manifest spot-checks: the diffusers VQModel vocabulary
        assert "encoder.down_blocks.0.resnets.0.norm1.weight" in sd
        assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
        assert "quantize.embedding.weight" in sd
        back = _convert_vq_state_dict(sd, model, strict=True)
        flat_a = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            assert flat_a[k].shape == flat_b[k].shape, k
            assert np.allclose(flat_a[k], flat_b[k]), k
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        y1 = model.apply(params, x)
        y2 = model.apply(back, x)
        assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    def test_strict_rejects_unknown(self):
        model, params = self._model_params()
        sd = _vae_flax_to_torch_sd(params)
        sd["decoder.mystery.weight"] = np.zeros((2, 2))
        with pytest.raises(ValueError, match="not mapped"):
            _convert_vq_state_dict(sd, model, strict=True)


class TestKLConverterRoundtrip:
    def test_roundtrip_exact_and_strict(self):
        model = AutoencoderKLFlax(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        sd = _vae_flax_to_torch_sd(params, has_codebook=False)
        back = _convert_vq_state_dict(sd, model, has_codebook=False, strict=True)
        flat_a = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert set(flat_a) == set(flat_b)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        z1 = model.apply(params, x, method=model.encode)
        z2 = model.apply(back, x, method=model.encode)
        assert np.allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
