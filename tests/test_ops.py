"""Pallas flash-attention kernel vs the XLA reference path.

The kernel targets TPU; on the CPU test mesh we run it in interpreter mode,
which executes the same blocked online-softmax program."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.ops import attention as A


def _interpreted_pallas(q, k, v, n_heads):
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        # bypass the jit cache (it closes over the unpatched pallas_call)
        return A._pallas_attention.__wrapped__(q, k, v, n_heads)


@pytest.mark.parametrize("T,heads", [(64, 1), (256, 4)])
def test_flash_matches_xla_single_block(T, heads):
    rng = np.random.default_rng(0)
    B, C = 2, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32) for _ in range(3))
    ref = A.xla_attention(q, k, v, heads)
    out = _interpreted_pallas(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_xla_multi_kv_block():
    """T=2048 > 1024 exercises the streamed online-softmax path."""
    rng = np.random.default_rng(1)
    B, T, C, heads = 1, 2048, 32, 1
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32) for _ in range(3))
    ref = A.xla_attention(q, k, v, heads)
    out = _interpreted_pallas(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_block_sizes():
    assert A._block_sizes(256, 64) == (256, 256)
    assert A._block_sizes(1024, 64) == (1024, 1024)
    assert A._block_sizes(4096, 64) == (512, 512)
    assert A._block_sizes(2048, 32) == (512, 512)


def _interpreted_packed(q, k, v, n_heads):
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        return A._pallas_attention_packed.__wrapped__(q, k, v, n_heads)


@pytest.mark.parametrize("B,T,heads", [(16, 64, 1), (6, 256, 4), (3, 128, 1)])
def test_packed_matches_xla(B, T, heads):
    """The small-T packed kernel (several batch rows per grid step) must
    reproduce the XLA softmax attention, including when B*H is not a
    multiple of the preferred packing factor."""
    rng = np.random.default_rng(2)
    C = 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32) for _ in range(3))
    ref = A.xla_attention(q, k, v, heads)
    out = _interpreted_packed(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grad_flows_through_fast_path():
    """Training routes UNet self-attention through the dispatch; the
    custom_vjp must (a) keep the Pallas forward (no fallback warning) and
    (b) produce the exact XLA attention gradients via softmax recompute."""
    import warnings
    from unittest import mock
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(3)
    B, T, C, heads = 3, 96, 32, 2  # unique shape: forces a fresh (patched) trace
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32) for _ in range(3))

    def loss_fast(q, k, v):
        return (A._attention_ad(q, k, v, heads) ** 2).sum()

    def loss_ref(q, k, v):
        return (A.xla_attention(q, k, v, heads) ** 2).sum()

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ), warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # fallback -> fail
        grads = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)


def test_packing_factor_vmem_budget():
    """G must divide B*H and keep double-buffered q/k/v/o blocks plus the
    fp32 logits tile under the VMEM budget; the fp32 T=256 case must drop
    below 8 rows (a fixed G=8 OOM'd on v5e)."""
    # bf16 CIFAR hot shape: full packing
    assert A._packing_factor(512 * 1, 256, 256, 2) == 8
    # fp32 at T=256, hd=256: logits tile forces G down
    g32 = A._packing_factor(512, 256, 256, 4)
    assert g32 < 8
    blocks = 2 * 4 * g32 * 256 * 256 * 4 + 2 * g32 * 256 * 256 * 4
    assert blocks <= 14 * 1024 * 1024
    # divisibility: BH=6 can only pack 2
    assert A._packing_factor(6, 64, 64, 4) == 2
    # degenerate: BH prime -> G=1 always works
    assert A._packing_factor(7, 512, 64, 4) == 1


class TestAttentionBlockFused:
    """The fused attention-block surface: the XLA reference composition must
    match an explicit flax GroupNorm + Dense construction, and the Pallas
    kernel (interpret mode) must match the reference."""

    def _args(self, dtype, B=2, T=64, C=32):
        r = jax.random.PRNGKey(0)
        ks = jax.random.split(r, 12)
        x = jax.random.normal(ks[0], (B, T, C), dtype)
        gamma = jax.random.normal(ks[1], (C,), dtype) * 0.1 + 1.0
        beta = jax.random.normal(ks[2], (C,), dtype) * 0.1
        w = lambda i: jax.random.normal(ks[i], (C, C), dtype) * (C ** -0.5)
        b = lambda i: jax.random.normal(ks[i], (C,), dtype) * 0.01
        return (x, gamma, beta, w(3), b(4), w(5), b(6), w(7), b(8), w(9), b(10))

    def test_ref_matches_flax_composition(self):
        from flax import linen as nn

        args = self._args(jnp.float32)
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo = args
        groups, eps = 8, 1e-6
        got = A.attention_block_ref(*args, groups, eps, 1, 2.0)

        gn = nn.GroupNorm(num_groups=groups, epsilon=eps,
                          use_scale=False, use_bias=False)
        h = gn.apply({}, x) * gamma + beta
        q, k, v = h @ wq + bq, h @ wk + bk, h @ wv + bv
        o = A.xla_attention(q, k, v, 1)
        expected = (x + (o @ wo + bo)) / 2.0
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=1e-5
        )

    def test_fused_kernel_matches_ref_interpret(self):
        import functools
        from unittest import mock
        from jax.experimental import pallas as pl

        args = self._args(jnp.float32, B=4, T=64, C=32)
        groups, eps = 8, 1e-6
        ref = A.attention_block_ref(*args, groups, eps, 1, 1.0)
        orig = pl.pallas_call
        with mock.patch.object(
            pl, "pallas_call", functools.partial(orig, interpret=True)
        ):
            got = A._attention_block_fused(*args, groups, eps, 1, 1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )

    def test_pack_factor_scales_with_itemsize(self):
        # At the CIFAR hot shape (T=256, C=256) bf16 packs G=8 inside the
        # 20 MB budget; f32 doubles the block/weight bytes so G must drop —
        # an f32 forward previously overran VMEM at Mosaic compile time.
        g_bf16 = A._block_pack_factor(512, 256, 256, itemsize=2)
        g_f32 = A._block_pack_factor(512, 256, 256, itemsize=4)
        assert g_bf16 == 8
        assert g_f32 < g_bf16

        def modeled_bytes(G, T, C, itemsize):
            blocks = 2 * 2 * G * T * C * itemsize
            weights = 2 * (4 * C * C + 8 * C) * itemsize
            temps = G * T * 3 * C * 4 + 2 * G * T * T * 4 + 2 * G * T * C * 4
            return blocks + weights + temps

        assert modeled_bytes(g_f32, 256, 256, 4) <= 20 * 1024 * 1024

    def test_grad_flows_through_block_dispatch(self):
        args = self._args(jnp.float32)
        groups, eps = 8, 1e-6

        def loss(*a):
            return (A.attention_block(*a, groups, eps, 1, 1.0) ** 2).sum()

        grads = jax.grad(loss, argnums=(0, 3, 9))(*args)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0.0
