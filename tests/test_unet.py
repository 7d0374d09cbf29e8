"""UNet2D structure/shape tests + torch->flax converter roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.models import UNet2D, UNet2DConfig
from villandiffusion_tpu.models import convert as C


import functools


@functools.lru_cache(maxsize=2)
def tiny_model_and_params():
    model = UNet2D(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0), batch=2)
    return model, params


def tiny_config(**kw):
    base = dict(
        in_channels=3,
        out_channels=3,
        sample_size=16,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=8,
        downsample_padding=0,
    )
    base.update(kw)
    return UNet2DConfig(**base)


class TestUpsample:
    def test_dilated_equals_naive(self, monkeypatch):
        """The base-dilated transposed-conv formulation must reproduce
        nearest-2x + 3x3 conv exactly (fp32)."""
        from villandiffusion_tpu.models.unet2d import Upsample

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32), jnp.float32)
        m = Upsample(channels=24)
        params = m.init(jax.random.PRNGKey(1), x)
        y_dilated = m.apply(params, x)
        monkeypatch.setenv("VILLAN_UPSAMPLE_NAIVE", "1")
        y_naive = m.apply(params, x)
        assert y_dilated.shape == (2, 32, 32, 24)
        assert jnp.max(jnp.abs(y_dilated - y_naive)) < 1e-4


class TestUNetForward:
    def test_shapes_and_determinism(self):
        model, params = tiny_model_and_params()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.array([3, 700])
        f = jax.jit(model.apply)
        y1, y2 = f(params, x, t), f(params, x, t)
        assert y1.shape == (2, 16, 16, 3)
        assert jnp.allclose(y1, y2)
        assert bool(jnp.isfinite(y1).all())

    def test_time_conditioning_matters(self):
        model, params = tiny_model_and_params()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        f = jax.jit(model.apply)
        y1 = f(params, x, jnp.array([0]))
        y2 = f(params, x, jnp.array([900]))
        assert not jnp.allclose(y1, y2)

    def test_ddpm32_param_count_matches_hf(self):
        """google/ddpm-cifar10-32 has 35,746,307 parameters."""
        model = UNet2D(UNet2DConfig.ddpm_cifar10())
        params = model.init_params(jax.random.PRNGKey(0))
        n = sum(p.size for p in jax.tree.leaves(params))
        assert n == 35_746_307


class TestTimestepEmbedding:
    def test_formula(self):
        from villandiffusion_tpu.models.unet2d import timestep_embedding

        dim, shift = 8, 1.0
        t = jnp.array([7.0])
        emb = timestep_embedding(t, dim, flip_sin_to_cos=False, freq_shift=shift)
        half = dim // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / (half - shift))
        want = np.concatenate([np.sin(7 * freqs), np.cos(7 * freqs)])
        assert np.allclose(np.asarray(emb[0]), want, atol=1e-5)

    def test_flip(self):
        from villandiffusion_tpu.models.unet2d import timestep_embedding

        t = jnp.array([3.0])
        a = timestep_embedding(t, 8, flip_sin_to_cos=False, freq_shift=0.0)
        b = timestep_embedding(t, 8, flip_sin_to_cos=True, freq_shift=0.0)
        assert np.allclose(np.asarray(a[0, :4]), np.asarray(b[0, 4:]))


def _flax_to_torch_sd(params, config):
    """Inverse mapping (test-only): flax tree -> diffusers state_dict keys."""
    sd = {}

    def emit(tpath, leaf_name, arr):
        arr = np.asarray(arr)
        if leaf_name == "kernel" and arr.ndim == 4:
            sd[tpath + ".weight"] = np.transpose(arr, (3, 2, 0, 1))
        elif leaf_name == "kernel":
            sd[tpath + ".weight"] = np.transpose(arr, (1, 0))
        elif leaf_name in ("scale", "weight"):  # GN scale / fourier W
            sd[tpath + ".weight"] = arr
        else:
            sd[tpath + ".bias"] = arr

    def torch_name(flax_module):
        if flax_module == "time_dense_1":
            return "time_embedding.linear_1"
        if flax_module == "time_dense_2":
            return "time_embedding.linear_2"
        if flax_module == "time_proj":
            return "time_proj"
        if flax_module == "norm_out":
            return "conv_norm_out"
        if flax_module in ("conv_in", "conv_out"):
            return flax_module
        if flax_module.startswith("mid_res_"):
            return f"mid_block.resnets.{flax_module[-1]}"
        if flax_module == "mid_attn":
            return "mid_block.attentions.0"
        parts = flax_module.split("_")
        kind, i = parts[0], parts[1]
        if parts[2] == "res":
            return f"{kind}_blocks.{i}.resnets.{parts[3]}"
        if parts[2] == "attn":
            return f"{kind}_blocks.{i}.attentions.{parts[3]}"
        if parts[2] == "downsample":
            return f"{kind}_blocks.{i}.downsamplers.0"
        if parts[2] == "upsample":
            return f"{kind}_blocks.{i}.upsamplers.0"
        # NCSN++ skip-block modules (diffusers Skip*Block2D layout)
        if parts[2] == "resnet":  # down_{i}_resnet_down / up_{i}_resnet_up
            return f"{kind}_blocks.{i}.resnet_{parts[3]}"
        if parts[2] == "skip":  # skip_conv / skip_norm
            return f"{kind}_blocks.{i}.skip_{parts[3]}"
        raise KeyError(flax_module)

    def walk(node, tprefix, leafname_parent):
        for k, v in node.items():
            if isinstance(v, dict):
                prefix = torch_name(k) if tprefix is None else f"{tprefix}.{k}"
                walk(v, prefix, k)
            else:
                emit(tprefix, k, v)

    walk(params["params"], None, None)
    return sd


def _ncsnpp_tiny_config():
    """Tiny NCSN++: same block vocabulary as fusing/cifar10-ncsnpp-ve
    (/root/reference/model.py:836-858) at smoke-test width."""
    return tiny_config(
        block_out_channels=(32, 32),
        down_block_types=("SkipDownBlock2D", "AttnSkipDownBlock2D"),
        up_block_types=("AttnSkipUpBlock2D", "SkipUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=None,
        time_embedding_type="fourier",
        norm_eps=1e-6,
        mid_block_scale_factor=float(np.sqrt(2.0)),
    )


class TestConverter:
    def test_roundtrip_structure_and_values(self):
        config = tiny_config()
        model, params = tiny_model_and_params()
        sd = _flax_to_torch_sd(params, config)
        back = C.torch_state_dict_to_flax(sd, config)

        flat_a = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert set(flat_a) == set(flat_b)
        for key in flat_a:
            assert flat_a[key].shape == flat_b[key].shape, key
            assert np.allclose(flat_a[key], flat_b[key]), key

    def test_converted_params_run(self):
        config = tiny_config()
        model, params = tiny_model_and_params()
        sd = _flax_to_torch_sd(params, config)
        back = C.torch_state_dict_to_flax(sd, config)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        y1 = jax.jit(model.apply)(params, x, jnp.array([5]))
        y2 = jax.jit(model.apply)(back, x, jnp.array([5]))
        assert jnp.allclose(y1, y2, atol=1e-6)

    def test_ncsnpp_roundtrip_strict(self):
        """NCSN++ skip-block layout: every synthesized diffusers key maps
        (strict), values roundtrip exactly, converted params run."""
        config = _ncsnpp_tiny_config()
        model = UNet2D(config)
        params = model.init_params(jax.random.PRNGKey(0), batch=2)
        sd = _flax_to_torch_sd(params, config)
        # the key manifest is exactly the diffusers Skip*Block2D vocabulary
        assert "time_proj.weight" in sd
        assert "down_blocks.0.resnet_down.conv1.weight" in sd
        assert "down_blocks.0.skip_conv.weight" in sd
        assert "up_blocks.0.resnet_up.conv_shortcut.weight" in sd
        assert "up_blocks.0.skip_norm.weight" in sd
        # final skip up block combines through conv_out (no skip_conv)
        assert "up_blocks.1.skip_conv.weight" not in sd
        back = C.torch_state_dict_to_flax(sd, config, strict=True)

        flat_a = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert set(flat_a) == set(flat_b)
        for key in flat_a:
            assert flat_a[key].shape == flat_b[key].shape, key
            assert np.allclose(flat_a[key], flat_b[key]), key

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        sigma = jnp.array([3.0, 1.0])
        y1 = jax.jit(model.apply)(params, x, sigma)
        y2 = jax.jit(model.apply)(back, x, sigma)
        assert jnp.allclose(y1, y2, atol=1e-6)

    def test_strict_rejects_unknown_keys(self):
        config = tiny_config()
        _model, params = tiny_model_and_params()
        sd = _flax_to_torch_sd(params, config)
        sd["down_blocks.0.mystery.weight"] = np.zeros((4, 4))
        with pytest.raises(ValueError, match="not mapped"):
            C.torch_state_dict_to_flax(sd, config, strict=True)

    def test_config_from_diffusers_json(self):
        cfg = C.config_from_diffusers_json(
            {
                "in_channels": 3,
                "out_channels": 3,
                "sample_size": 32,
                "block_out_channels": [128, 256, 256, 256],
                "down_block_types": [
                    "DownBlock2D", "AttnDownBlock2D", "DownBlock2D", "DownBlock2D",
                ],
                "up_block_types": [
                    "UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
                ],
                "layers_per_block": 2,
                "downsample_padding": 0,
                "norm_eps": 1e-06,
                "flip_sin_to_cos": False,
                "freq_shift": 1,
            }
        )
        assert cfg.block_out_channels == (128, 256, 256, 256)
        assert cfg.freq_shift == 1
