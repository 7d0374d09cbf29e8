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
