"""VQ-VAE (LDM) and AutoencoderKL (SD) in Flax, NHWC.

Mirrors the diffusers VQModel/AutoencoderKL graphs used by the reference's
LDM and SD paths (/root/reference/model.py:706-776 — CompVis/ldm-celebahq-256
vqvae; viallanDiffusion_conditional.py vae).  ``encode`` returns
pre-quantization latents (the reference uses ``vae.encode(x).latents``
without quantizing, /root/reference/loss.py:941-951); ``decode`` quantizes
through the codebook first (diffusers VQModel.decode default).

Weight conversion from a local diffusers torch checkpoint mirrors
models/convert.py conventions (OIHW->HWIO).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import math

from villandiffusion_tpu.models.unet2d import AttentionBlock, group_norm


def _gn(channels: int, groups: int) -> int:
    """Largest divisor of `channels` not exceeding `groups` (tiny test
    configs have channels < 32; production channels are multiples of 32)."""
    return math.gcd(groups, channels) if channels % groups else groups


class ResnetBlockNoTime(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = group_norm(x, _gn(in_ch, self.groups), self.eps, "norm1")
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name="conv1")(h)
        h = group_norm(h, _gn(self.out_channels, self.groups), self.eps, "norm2")
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), param_dtype=jnp.float32,
                        name="conv_shortcut")(x)
        return x + h


class Encoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    latent_channels: int
    double_z: bool = False
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlockNoTime(ch, self.groups, name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_out_channels) - 1:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            param_dtype=jnp.float32, name=f"down_{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = ResnetBlockNoTime(ch, self.groups, name="mid_res_0")(h)
        h = AttentionBlock(groups=_gn(ch, self.groups), eps=1e-6, name="mid_attn")(h)
        h = ResnetBlockNoTime(ch, self.groups, name="mid_res_1")(h)
        h = group_norm(h, _gn(ch, self.groups), 1e-6, "norm_out")
        h = nn.silu(h)
        out_ch = self.latent_channels * (2 if self.double_z else 1)
        return nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       param_dtype=jnp.float32, name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, z):
        rev = tuple(reversed(self.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name="conv_in")(z)
        ch = rev[0]
        h = ResnetBlockNoTime(ch, self.groups, name="mid_res_0")(h)
        h = AttentionBlock(groups=_gn(ch, self.groups), eps=1e-6, name="mid_attn")(h)
        h = ResnetBlockNoTime(ch, self.groups, name="mid_res_1")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlockNoTime(ch, self.groups, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            param_dtype=jnp.float32, name=f"up_{i}_upsample")(h)
        h = group_norm(h, _gn(ch, self.groups), 1e-6, "norm_out")
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       param_dtype=jnp.float32, name="conv_out")(h)


class VQModelFlax(nn.Module):
    """VQ-VAE matching CompVis/ldm-celebahq-256 (3-ch 64x64 latents)."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    layers_per_block: int = 2
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 3
    num_vq_embeddings: int = 8192

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            name="encoder",
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, self.out_channels,
            name="decoder",
        )
        self.quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       param_dtype=jnp.float32, name="post_quant_conv")
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.num_vq_embeddings),
            (self.num_vq_embeddings, self.latent_channels),
        )

    def encode(self, x):
        """Pixel -> pre-quantization latents (reference 'latents' surface)."""
        return self.quant_conv(self.encoder(x))

    def quantize(self, z):
        flat = z.reshape(-1, z.shape[-1])
        d = (
            (flat**2).sum(-1, keepdims=True)
            - 2 * flat @ self.codebook.T
            + (self.codebook**2).sum(-1)[None, :]
        )
        idx = jnp.argmin(d, axis=-1)
        return self.codebook[idx].reshape(z.shape)

    def decode(self, z, force_not_quantize: bool = False):
        if not force_not_quantize:
            z = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))


class AutoencoderKLFlax(nn.Module):
    """KL autoencoder matching SD v1 (4-ch latents, scaling 0.18215)."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            double_z=True, name="encoder",
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, self.out_channels,
            name="decoder",
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       param_dtype=jnp.float32, name="post_quant_conv")

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))  # (..., 2*latent): mean|logvar

    def encode(self, x, rng: Optional[jax.Array] = None):
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean + std * jax.random.normal(rng, mean.shape)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))


@dataclasses.dataclass
class VAEBundle:
    """Pipeline-facing wrapper around a frozen VAE.

    ``encode_with``/``decode_with`` take the params EXPLICITLY so jitted
    consumers (samplers, train steps) can pass them as arguments — a VAE
    applied with closed-over params bakes every weight into the compiled
    program as literal constants (hundreds of MB of HLO for the SD KL-VAE),
    which bloats compile payloads and executables.  ``encode``/``decode``
    are the eager conveniences that close over ``self.params``.
    """

    model: object
    params: dict
    scaling_factor: float = 1.0

    def encode_with(self, params, x, rng=None):
        if rng is not None:
            try:
                z = self.model.apply(params, x, rng, method=self.model.encode)
            except TypeError:  # VQ encode takes no rng
                z = self.model.apply(params, x, method=self.model.encode)
        else:
            z = self.model.apply(params, x, method=self.model.encode)
        return z * self.scaling_factor

    def decode_with(self, params, z):
        return self.model.apply(
            params, z / self.scaling_factor, method=self.model.decode
        )

    def encode(self, x, rng=None):
        return self.encode_with(self.params, x, rng)

    def decode(self, z):
        return self.decode_with(self.params, z)


def make_random_vq(rng=None, **kwargs) -> VAEBundle:
    """Random-init VQModel (tests / no-weights envs)."""
    size = kwargs.pop("sample_size", 64)
    model = VQModelFlax(**kwargs)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros((1, size, size, model.in_channels))
    params = jax.jit(lambda r, xx: model.init(r, xx))(rng, x)
    return VAEBundle(model=model, params=params)


def save_vae_dir(out_dir: str, bundle: VAEBundle) -> None:
    """Write <out_dir>/vqvae/{config.json, params.msgpack} (framework-native
    layout).  The reference's ``pipeline.save_pretrained`` persists the LDM
    run's ``vqvae/`` next to ``unet/`` (/root/reference/VillanDiffusion.py:
    1109), which is what makes ``--mode resume``/``sampling`` on an LDM run
    dir self-contained — mirror that here."""
    import json
    import os

    from flax import serialization

    from villandiffusion_tpu.io.checkpoint import _atomic_write

    vq_dir = os.path.join(out_dir, "vqvae")
    os.makedirs(vq_dir, exist_ok=True)
    model = bundle.model
    cfg = {"_class": type(model).__name__,
           "scaling_factor": bundle.scaling_factor}
    for field in ("block_out_channels", "layers_per_block", "in_channels",
                  "out_channels", "latent_channels", "num_vq_embeddings"):
        if hasattr(model, field):
            val = getattr(model, field)
            cfg[field] = list(val) if isinstance(val, tuple) else val
    _atomic_write(os.path.join(vq_dir, "config.json"),
                  json.dumps(cfg, indent=2).encode())
    params_host = jax.tree.map(np.asarray, bundle.params)
    # tmp+fsync+rename: a watchdog kill mid-write must never leave a
    # truncated params.msgpack that cli.save_everything's exists-check then
    # skips forever (the VAE has no orbax recovery path, unlike the unet).
    _atomic_write(os.path.join(vq_dir, "params.msgpack"),
                  serialization.to_bytes(params_host))


def load_vae_dir(vq_dir: str) -> VAEBundle:
    """Read a save_vae_dir export back into a VAEBundle."""
    import json
    import os

    from flax import serialization

    with open(os.path.join(vq_dir, "config.json")) as f:
        cfg = json.load(f)
    cls = {"VQModelFlax": VQModelFlax,
           "AutoencoderKLFlax": AutoencoderKLFlax}[cfg.pop("_class")]
    scaling = cfg.pop("scaling_factor", 1.0)
    if "block_out_channels" in cfg:
        cfg["block_out_channels"] = tuple(cfg["block_out_channels"])
    model = cls(**cfg)
    with open(os.path.join(vq_dir, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(bytearray(f.read()))
    return VAEBundle(model=model, params=params, scaling_factor=scaling)


def load_vae_for(ckpt: str):
    """Resolve the VAE for an LDM checkpoint name; local weights only.

    Resolution order: (1) a framework run dir's own ``vqvae/`` export
    (save_vae_dir layout), (2) a local diffusers torch checkpoint under
    $VILLAN_PRETRAINED.  No network access in this env."""
    import os

    from villandiffusion_tpu.factory import PRETRAINED_ENV, HUB_IDS

    run_cand = os.path.join(ckpt, "vqvae")
    if os.path.exists(os.path.join(run_cand, "params.msgpack")):
        return load_vae_dir(run_cand)
    root = os.environ.get(PRETRAINED_ENV, "pretrained")
    cand = os.path.join(root, HUB_IDS.get(ckpt, ckpt), "vqvae")
    if os.path.isdir(cand):
        return load_vq_checkpoint(cand)
    raise FileNotFoundError(
        f"No local VQ-VAE weights under {run_cand!r} or {cand!r}; SDE-LDM "
        "needs the vqvae/ directory of the LDM checkpoint (no network "
        "access in this env)."
    )


def _t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def load_vq_checkpoint(vq_dir: str) -> VAEBundle:
    """Convert a diffusers VQModel torch checkpoint directory."""
    import json
    import os

    import torch

    with open(os.path.join(vq_dir, "config.json")) as f:
        cfg = json.load(f)
    sd = torch.load(
        os.path.join(vq_dir, "diffusion_pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    sd = {k: v.numpy() for k, v in sd.items()}
    model = VQModelFlax(
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 3),
        num_vq_embeddings=cfg.get("num_vq_embeddings", 8192),
    )
    params = _convert_vq_state_dict(sd, model, strict="warn")
    return VAEBundle(model=model, params=params)


def load_kl_checkpoint(vae_dir: str) -> VAEBundle:
    """Convert a diffusers AutoencoderKL torch checkpoint directory (the
    vae/ of an SD checkpoint); scaling_factor from config (SD v1: 0.18215)."""
    import json
    import os

    import torch

    with open(os.path.join(vae_dir, "config.json")) as f:
        cfg = json.load(f)
    sd = torch.load(
        os.path.join(vae_dir, "diffusion_pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    sd = {k: v.numpy() for k, v in sd.items()}
    model = AutoencoderKLFlax(
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
    )
    params = _convert_vq_state_dict(sd, model, has_codebook=False, strict="warn")
    return VAEBundle(
        model=model, params=params,
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def _convert_vq_state_dict(
    sd, model, has_codebook: bool = True, strict: bool = False
) -> dict:
    """Map a diffusers VQModel/AutoencoderKL state_dict onto the flax tree.

    ``strict=True`` asserts every checkpoint tensor was consumed — an
    unconsumed key means the converter does not understand the layout
    (guards the CompVis/ldm-celebahq-256 vqvae and SD-v1 vae conversions,
    /root/reference/model.py:706-776)."""
    consumed = set()
    raw_get = sd.__getitem__

    class _Tracked(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return raw_get(k)

    sd = _Tracked(sd)
    tree: dict = {"params": {}}
    p = tree["params"]

    def put(path, leaf, val):
        node = p
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node.setdefault(path[-1], {})[leaf] = np.asarray(val, np.float32)

    def conv(tp, fp):
        put(fp, "kernel", _t_conv(sd[tp + ".weight"]))
        put(fp, "bias", sd[tp + ".bias"])

    def norm(tp, fp):
        put(fp, "scale", sd[tp + ".weight"])
        put(fp, "bias", sd[tp + ".bias"])

    def resnet(tp, fp):
        norm(tp + ".norm1", fp + ("norm1",))
        conv(tp + ".conv1", fp + ("conv1",))
        norm(tp + ".norm2", fp + ("norm2",))
        conv(tp + ".conv2", fp + ("conv2",))
        if tp + ".conv_shortcut.weight" in sd:
            conv(tp + ".conv_shortcut", fp + ("conv_shortcut",))

    def attn(tp, fp):
        norm(tp + ".group_norm", fp + ("group_norm",))
        for n in ("query", "key", "value", "proj_attn"):
            put(fp + (n,), "kernel", np.transpose(sd[f"{tp}.{n}.weight"], (1, 0)))
            put(fp + (n,), "bias", sd[f"{tp}.{n}.bias"])

    nblocks = len(model.block_out_channels)
    # encoder
    conv("encoder.conv_in", ("encoder", "conv_in"))
    for i in range(nblocks):
        for j in range(model.layers_per_block):
            resnet(
                f"encoder.down_blocks.{i}.resnets.{j}",
                ("encoder", f"down_{i}_res_{j}"),
            )
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                ("encoder", f"down_{i}_downsample"),
            )
    resnet("encoder.mid_block.resnets.0", ("encoder", "mid_res_0"))
    attn("encoder.mid_block.attentions.0", ("encoder", "mid_attn"))
    resnet("encoder.mid_block.resnets.1", ("encoder", "mid_res_1"))
    norm("encoder.conv_norm_out", ("encoder", "norm_out"))
    conv("encoder.conv_out", ("encoder", "conv_out"))
    # decoder
    conv("decoder.conv_in", ("decoder", "conv_in"))
    resnet("decoder.mid_block.resnets.0", ("decoder", "mid_res_0"))
    attn("decoder.mid_block.attentions.0", ("decoder", "mid_attn"))
    resnet("decoder.mid_block.resnets.1", ("decoder", "mid_res_1"))
    for i in range(nblocks):
        for j in range(model.layers_per_block + 1):
            resnet(
                f"decoder.up_blocks.{i}.resnets.{j}", ("decoder", f"up_{i}_res_{j}")
            )
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
                ("decoder", f"up_{i}_upsample"),
            )
    norm("decoder.conv_norm_out", ("decoder", "norm_out"))
    conv("decoder.conv_out", ("decoder", "conv_out"))
    conv("quant_conv", ("quant_conv",))
    conv("post_quant_conv", ("post_quant_conv",))
    if has_codebook:
        p["codebook"] = np.asarray(sd["quantize.embedding.weight"], np.float32)
    if strict:
        leftover = set(sd.keys()) - consumed
        if leftover:
            msg = (
                f"{len(leftover)} VAE checkpoint tensors not mapped: "
                f"{sorted(leftover)[:8]}..."
            )
            if strict == "warn":
                from villandiffusion_tpu.utils.log import Log

                Log.warning(msg)
            else:
                raise ValueError(msg)
    return tree
