"""Fused GroupNorm(+SiLU) kernel vs flax nn.GroupNorm semantics."""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.ops import groupnorm as GN


def _interpreted_pallas(x, sc, bi, groups, eps, act):
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        return GN._pallas_group_norm.__wrapped__(x, sc, bi, groups, eps, act)


@pytest.mark.parametrize("shape,groups", [((4, 8, 8, 64), 32), ((6, 4, 4, 32), 8)])
def test_xla_matches_flax(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    ref = nn.GroupNorm(num_groups=groups, epsilon=1e-6).apply(
        {"params": {"scale": sc, "bias": bi}}, x
    )
    out = GN.xla_group_norm(x, sc, bi, groups, 1e-6, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("act", [False, True])
def test_pallas_matches_xla(act):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 128)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(128), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(128), jnp.float32)
    ref = GN.xla_group_norm(x, sc, bi, 32, 1e-6, act)
    out = _interpreted_pallas(x, sc, bi, 32, 1e-6, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradients_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)
    sc = jnp.ones(16, jnp.float32)
    bi = jnp.zeros(16, jnp.float32)

    def f(x, sc, bi):
        return (GN.group_norm_silu(x, sc, bi, 4, 1e-6, True) ** 2).sum()

    gx, gsc, gbi = jax.grad(f, argnums=(0, 1, 2))(x, sc, bi)
    # compare against the plain (non-custom-vjp) reference
    def fr(x, sc, bi):
        return (GN.xla_group_norm(x, sc, bi, 4, 1e-6, True) ** 2).sum()

    rx, rsc, rbi = jax.grad(fr, argnums=(0, 1, 2))(x, sc, bi)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gsc), np.asarray(rsc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gbi), np.asarray(rbi), atol=1e-5)


def test_batch_block_divides():
    assert 512 % GN._batch_block(512, 1024, 128, 2) == 0
    assert GN._batch_block(3, 16, 32, 4) in (1, 3)
