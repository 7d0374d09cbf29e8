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


def _interp_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
                     groups, eps, out_scale):
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        return FC._pallas_resblock.__wrapped__(
            x, t, s1, b1, w1, c1b, s2, b2, w2, c2b, scw, scb,
            groups, eps, out_scale)


@pytest.mark.parametrize("C,Co,shortcut", [(32, 32, False), (32, 64, True)])
def test_resblock_kernel_matches_xla(C, Co, shortcut):
    rng = np.random.default_rng(3)
    G = 8
    x = jnp.asarray(rng.standard_normal((4, 8, 8, C)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, Co)), jnp.float32)
    s1 = jnp.asarray(rng.standard_normal(C), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
    c1b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    s2 = jnp.asarray(rng.standard_normal(Co), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(Co), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, Co, Co)) * 0.1, jnp.float32)
    c2b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    if shortcut:
        scw = jnp.asarray(rng.standard_normal((1, 1, C, Co)) * 0.1, jnp.float32)
        scb = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
        scw_k = scw.reshape(C, Co)
    else:
        scw = scb = scw_k = None
    ref = FC.xla_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b,
                          scw, scb, G, 1e-6, 2.0)
    out = _interp_resblock(x, t, s1, b1, w1, c1b, s2, b2, w2, c2b,
                           scw_k, scb, G, 1e-6, 2.0)
    # kernel normalizes+casts to bf16 before the MXU matmuls
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=1e-2)


def test_xla_resblock_matches_model_resnetblock():
    """xla_resblock must compose EXACTLY like models/unet2d.py::ResnetBlock
    (the fused kernel's correctness target)."""
    from villandiffusion_tpu.models.unet2d import ResnetBlock

    rng = np.random.default_rng(4)
    C, Co, G = 32, 64, 8
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
    blk = ResnetBlock(out_channels=Co, groups=G, eps=1e-6,
                      output_scale_factor=2.0)
    params = blk.init(jax.random.PRNGKey(1), x, temb)
    ref = blk.apply(params, x, temb)

    import flax.linen as nn

    p = params["params"]
    t = nn.silu(temb) @ p["time_emb_proj"]["kernel"] + p["time_emb_proj"]["bias"]
    out = FC.xla_resblock(
        x, t,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["conv1"]["kernel"], p["conv1"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
        p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"],
        G, 1e-6, 2.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_resblock_gradients_flow_through_custom_vjp():
    rng = np.random.default_rng(5)
    C, G = 16, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 4, C)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, C)), jnp.float32)
    s1 = jnp.ones(C); b1 = jnp.zeros(C)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    zb = jnp.zeros(C)

    def f(x, w1, w2):
        return (FC.resblock_fused(x, t, s1, b1, w1, zb, s1, b1, w2, zb,
                                  None, None, G, 1e-6, 1.0) ** 2).sum()

    def fr(x, w1, w2):
        return (FC.xla_resblock(x, t, s1, b1, w1, zb, s1, b1, w2, zb,
                                None, None, G, 1e-6, 1.0) ** 2).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(x, w1, w2)
    r = jax.grad(fr, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


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


def test_resblock_whole_block_param_tree_and_output(monkeypatch):
    """VILLAN_FUSED_RESBLOCK=1 routes the whole ResnetBlock through
    resblock_fused with a byte-identical param tree and matching output
    (CPU falls back to the XLA chain, pinned above vs the model)."""
    from villandiffusion_tpu.models.unet2d import ResnetBlock

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    for out_ch in (32, 64):  # identity and 1x1-conv shortcut
        blk = ResnetBlock(out_channels=out_ch, groups=8, eps=1e-6)
        monkeypatch.delenv("VILLAN_FUSED_RESBLOCK", raising=False)
        p0 = blk.init(jax.random.PRNGKey(0), x, temb)
        ref = blk.apply(p0, x, temb)
        monkeypatch.setenv("VILLAN_FUSED_RESBLOCK", "1")
        p1 = blk.init(jax.random.PRNGKey(0), x, temb)
        assert jax.tree.structure(p0) == jax.tree.structure(p1)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
            assert a.shape == b.shape and a.dtype == b.dtype
        out = blk.apply(p0, x, temb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_shape_gate_is_static():
    """The Pallas whole-block path must be admitted STATICALLY: under an
    outer jit a Mosaic lowering failure surfaces at the OUTER compile, after
    any try/except in resblock_fused has already returned — so only shapes
    in the validated Mosaic-tiling family may route to the kernel."""
    ok = FC._pallas_shape_supported
    # the two perf-validated dominant shapes
    assert ok(512, 16, 16, 256, 256, 32)
    assert ok(512, 32, 32, 128, 128, 32)
    # lane dims not 128-divisible -> XLA
    assert not ok(512, 16, 16, 192, 192, 32)
    assert not ok(2, 8, 8, 32, 64, 8)
    # sublane (H*W) not 8-divisible -> XLA
    assert not ok(512, 2, 2, 256, 256, 32)
    # channel/group mismatch -> XLA
    assert not ok(512, 16, 16, 256, 250, 32)
