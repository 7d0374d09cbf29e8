"""Fused GN+SiLU+3x3conv kernel vs the XLA reference composition."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.ops import fused_conv as FC


def _interp(x, sc, bi, w, b, groups, eps):
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        return FC._pallas_gn_silu_conv.__wrapped__(x, sc, bi, w, b, groups, eps)


@pytest.mark.parametrize("C,Co,groups", [(32, 32, 8), (32, 64, 8)])
def test_kernel_matches_xla(C, Co, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, C)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    ref = FC.xla_gn_silu_conv(x, sc, bi, w, b, groups, 1e-6)
    out = _interp(x, sc, bi, w, b, groups, 1e-6)
    # kernel normalizes+casts to bf16 before the matmuls (MXU path)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=1e-2)


def test_xla_reference_matches_unfused_modules():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    C, Co, G = 32, 32, 8
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-6).apply(
        {"params": {"scale": sc, "bias": bi}}, x
    )
    conv = nn.Conv(Co, (3, 3), padding=[(1, 1), (1, 1)]).apply(
        {"params": {"kernel": w, "bias": b}}, nn.silu(gn)
    )
    out = FC.xla_gn_silu_conv(x, sc, bi, w, b, G, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(conv), atol=1e-4)


def test_gradients_flow_through_custom_vjp():
    rng = np.random.default_rng(2)
    C, Co, G = 16, 16, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 4, C)), jnp.float32)
    sc = jnp.ones(C); bi = jnp.zeros(C)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
    b = jnp.zeros(Co)

    def f(x, w):
        return (FC.gn_silu_conv(x, sc, bi, w, b, G, 1e-6) ** 2).sum()

    def fr(x, w):
        return (FC.xla_gn_silu_conv(x, sc, bi, w, b, G, 1e-6) ** 2).sum()

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(fr, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)


def test_resnet_param_tree_identical_between_paths(monkeypatch):
    """The fused and unfused ResnetBlock paths must produce the same params."""
    from villandiffusion_tpu.models.unet2d import ResnetBlock

    x = jnp.zeros((2, 8, 8, 32))
    temb = jnp.zeros((2, 64))
    blk = ResnetBlock(out_channels=32, groups=8, eps=1e-6)
    monkeypatch.delenv("VILLAN_FUSED_CONV", raising=False)
    p_unfused = blk.init(jax.random.PRNGKey(0), x, temb)
    monkeypatch.setenv("VILLAN_FUSED_CONV", "1")
    p_fused = blk.init(jax.random.PRNGKey(0), x, temb)
    t1 = jax.tree.structure(p_unfused)
    t2 = jax.tree.structure(p_fused)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(p_unfused), jax.tree.leaves(p_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype
