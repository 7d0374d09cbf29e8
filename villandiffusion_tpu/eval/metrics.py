"""Attack-specificity/utility metrics: MSE, MSE-threshold, SSIM.

Parity: /root/reference/metric.py:31-85 — per-sample MSE averaged over the
batch; MSE-threshold = fraction of samples with per-sample MSE < thres
(attack-success rate at thres=0.1, /root/reference/config.py:177); SSIM with
an 11x11 gaussian window, sigma 1.5, data_range 1.0 (torchmetrics defaults).

TPU-first: each metric is one jitted reduction over the whole sample tensor;
no PNG round-trip (the reference reloads 10k PNGs from disk to compute these,
/root/reference/VillanDiffusion.py:1078).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _per_sample_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = (a - b) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1)


@jax.jit
def _mse(a, b):
    return _per_sample_mse(a, b).mean()


@functools.partial(jax.jit, static_argnums=(2,))
def _mse_thres(a, b, thres: float):
    return (_per_sample_mse(a, b) < thres).astype(jnp.float32).mean()


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _ssim(a, b, data_range: float = 1.0, size: int = 11, sigma: float = 1.5):
    """SSIM over NHWC batches; gaussian filtering per channel, uniform average
    over space/channels, per-sample value."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    kern = jnp.asarray(_gaussian_kernel(size, sigma), jnp.float32)
    C = a.shape[-1]
    kern4 = jnp.tile(kern[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise

    def filt(x):
        # precision=HIGHEST: on TPU the default conv precision is bf16
        # multiplies, and the variance terms below (filt(a*a) - mu^2) cancel
        # catastrophically at bf16 — denominators can go negative and SSIM
        # escapes [-1, 1] (observed: SSIM 1.75 on a diverged-model measure).
        # The 11x11 depthwise filter is negligible eval cost at f32.
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kern4,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    ssim_map = num / den
    return ssim_map.reshape(a.shape[0], -1).mean(axis=1)


class Metric:
    """Reference Metric surface (float scalars over full sample sets)."""

    @staticmethod
    def mse_batch(a, b, max_batch_n: int = 1024) -> float:
        return float(_mse(jnp.asarray(a), jnp.asarray(b)))

    @staticmethod
    def mse_thres_batch(a, b, thres: float, max_batch_n: int = 1024) -> float:
        return float(_mse_thres(jnp.asarray(a), jnp.asarray(b), float(thres)))

    @staticmethod
    def wilson_ci(p_hat: float, n: int, z: float = 1.96):
        """Wilson score 95% interval for a proportion — attack-success rates
        at a few hundred samples carry +-several-point binomial noise (the
        r4 VE rows 4.7% vs 2.3% at n=256 were statistically
        indistinguishable), so MSE_THRES scores report this alongside the
        point estimate."""
        if n <= 0:
            return (0.0, 1.0)
        denom = 1.0 + z * z / n
        center = (p_hat + z * z / (2 * n)) / denom
        half = (z / denom) * math.sqrt(
            p_hat * (1.0 - p_hat) / n + z * z / (4.0 * n * n))
        return (max(0.0, center - half), min(1.0, center + half))

    @staticmethod
    def ssim_batch(a, b, device=None, max_batch_n: int = 1024) -> float:
        a, b = jnp.asarray(a), jnp.asarray(b)
        # chunk to bound memory at 256px
        vals = []
        for lo in range(0, a.shape[0], max_batch_n):
            vals.append(np.asarray(_ssim(a[lo : lo + max_batch_n], b[lo : lo + max_batch_n])))
        return float(np.concatenate(vals).mean())
