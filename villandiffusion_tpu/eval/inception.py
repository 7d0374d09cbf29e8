"""FID InceptionV3 (pool3, 2048-d) in Flax, NHWC.

Implements the pt_inception-2015-12-05 network used by pytorch-fid (the
reference vendors it, /root/reference/fid_score.py:91-147), including the FID
variants: InceptionA/C/E pool branches use average pooling that excludes
padding, and Mixed_7c's pool branch uses max pooling.

BatchNorm is inference-only and folded at conversion time into a per-channel
(scale, bias) pair, so every block is conv + affine + relu — one fused XLA op
chain on TPU.

Weights: ``load_fid_inception_params(path)`` converts a local torch
state_dict (pt_inception-2015-12-05-6726825d.pth). This environment has no
network egress; when weights are absent the FID stack falls back to a
deterministic random-init extractor (relative FIDs only; flagged by the
caller).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv + folded-BN affine + ReLU."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            param_dtype=jnp.float32,
            # f32 multiplies: TPU conv default is bf16 on the MXU, but FID is
            # the eval *protocol* (the reference runs fp32 torch,
            # /root/reference/fid_score.py:91-147) and inception cost is
            # negligible next to generating the 10k samples it scores.
            precision=jax.lax.Precision.HIGHEST,
            name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + bias)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return p


def avg_pool_no_pad(x, window=3, stride=1):
    """3x3 s1 average pool with zero padding but divisor counting only valid
    elements (torch count_include_pad=False) — the FID-variant semantics."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def max_pool(x, window=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_no_pad(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(self.c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = ConvBN(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(self.c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = ConvBN(self.c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = ConvBN(self.c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_no_pad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (Mixed_7b) or "max" (Mixed_7c, FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = avg_pool_no_pad(x)
        else:
            bp = max_pool(x, 3, 1, padding=1)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Input: NHWC float in [0, 1], any HxW (bilinearly resized to 299).
    Output: (N, 2048) pool3 activations."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            B = x.shape[0]
            x = jax.image.resize(x, (B, 299, 299, x.shape[-1]), "bilinear")
        x = 2.0 * x - 1.0  # pytorch-fid normalize_input
        x = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(c7=128, name="Mixed_6b")(x)
        x = InceptionC(c7=160, name="Mixed_6c")(x)
        x = InceptionC(c7=160, name="Mixed_6d")(x)
        x = InceptionC(c7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg", name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> (N, 2048)


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

_BN_EPS = 1e-3


def _fold_bn(sd, prefix):
    gamma = sd[prefix + ".bn.weight"]
    beta = sd[prefix + ".bn.bias"]
    mean = sd[prefix + ".bn.running_mean"]
    var = sd[prefix + ".bn.running_var"]
    scale = gamma / np.sqrt(var + _BN_EPS)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def torch_inception_to_flax(sd) -> dict:
    """Map a pt_inception state_dict onto the FIDInceptionV3 param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: dict = {}

    def put(path, leaf, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = val

    def convbn(torch_prefix, flax_path):
        w = sd[torch_prefix + ".conv.weight"]
        put(flax_path + ("conv",), "kernel", np.transpose(w, (2, 3, 1, 0)).astype(np.float32))
        scale, bias = _fold_bn(sd, torch_prefix)
        node = tree
        for p in flax_path:
            node = node.setdefault(p, {})
        node["bn_scale"] = scale
        node["bn_bias"] = bias

    for stem in [
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ]:
        convbn(stem, (stem,))

    a_branches = [
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    ]
    for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        for br in a_branches:
            convbn(f"{blk}.{br}", (blk, br))
    for br in ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]:
        convbn(f"Mixed_6a.{br}", ("Mixed_6a", br))
    c_branches = [
        "branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
        "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
        "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool",
    ]
    for blk in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        for br in c_branches:
            convbn(f"{blk}.{br}", (blk, br))
    for br in ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
               "branch7x7x3_3", "branch7x7x3_4"]:
        convbn(f"Mixed_7a.{br}", ("Mixed_7a", br))
    e_branches = [
        "branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
        "branch3x3dbl_3b", "branch_pool",
    ]
    for blk in ["Mixed_7b", "Mixed_7c"]:
        for br in e_branches:
            convbn(f"{blk}.{br}", (blk, br))
    return {"params": tree}


def load_fid_inception_params(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return torch_inception_to_flax(sd)
