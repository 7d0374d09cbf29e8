"""k-diffusion-style sigma-space solvers: Heun (2nd order) and LMSD
(linear multistep, order 4).

Matches diffusers HeunDiscreteScheduler / LMSDiscreteScheduler semantics
(the reference factory wires them at model.py:647-652): VP model reused in
sigma space with sigma = sqrt((1-abar)/abar) interpolated over
``linspace(0, T-1, S)``, model input scaled by 1/sqrt(sigma^2+1), initial
latent scaled by sqrt(sigma_max^2+1).  For epsilon-prediction models the
ODE derivative is exactly the predicted eps.

LMSD's Adams-Bashforth coefficients (integrals of the Lagrange basis over
[sigma_k, sigma_{k+1}]) are precomputed EXACTLY on the host with numpy
polynomial integration — no runtime quadrature.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core.schedules import VPSchedule
from villandiffusion_tpu.samplers.base import Sampler


@dataclasses.dataclass(frozen=True)
class _SigmaBase(Sampler):
    schedule: VPSchedule = None

    def _ts_float(self, S: int) -> np.ndarray:
        T = self.schedule.timesteps
        return np.linspace(0, T - 1, S, dtype=np.float64)[::-1].copy()

    def _sigmas(self, S: int) -> np.ndarray:
        ab = self.schedule.alphas_cumprod
        full = np.sqrt((1.0 - ab) / ab)
        ts = self._ts_float(S)
        sig = np.interp(ts, np.arange(len(ab)), full)
        return np.concatenate([sig, [0.0]])  # position S is sigma=0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return self._ts_float(num_inference_steps)

    def cond(self, i, batch, num_inference_steps):
        ts = jnp.asarray(self.timesteps(num_inference_steps), jnp.float32)
        return jnp.broadcast_to(ts[jnp.minimum(i, len(ts) - 1)], (batch,))

    def init_latent_scale(self) -> float:
        return float(np.sqrt(self._sigmas_max**2 + 1.0))

    @property
    def _sigmas_max(self) -> float:
        ab = self.schedule.alphas_cumprod
        return float(np.sqrt((1.0 - ab[-1]) / ab[-1]))

    def _eps(self, eval_model, x, sigma, i):
        x_in = x / jnp.sqrt(sigma**2 + 1.0)
        return eval_model(x_in, i)


@dataclasses.dataclass(frozen=True)
class HeunSampler(_SigmaBase):
    def step(self, x, i, carry, rng, eval_model, num_inference_steps):
        S = num_inference_steps
        sig = jnp.asarray(self._sigmas(S), jnp.float32)
        s_cur, s_next = sig[i], sig[i + 1]

        d1 = self._eps(eval_model, x, s_cur, i)
        dt = s_next - s_cur
        x_euler = x + d1 * dt

        # 2nd-order correction (skipped for the final step to sigma=0)
        d2 = self._eps(eval_model, x_euler, s_next, jnp.minimum(i + 1, S - 1))
        x_heun = x + 0.5 * (d1 + d2) * dt
        x_next = jnp.where(s_next > 0, x_heun, x_euler)
        return x_next, carry


def _lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """coeffs[k, m] = int_{sigma_k}^{sigma_{k+1}} L_m(sigma) dsigma over the
    last min(k+1, order) sigma points (newest first), exact polynomial
    integration in fp64."""
    S = len(sigmas) - 1
    out = np.zeros((S, order), np.float64)
    for k in range(S):
        cur_order = min(k + 1, order)
        pts = [sigmas[k - m] for m in range(cur_order)]
        for m in range(cur_order):
            poly = np.poly1d([1.0])
            for j in range(cur_order):
                if j == m:
                    continue
                poly = poly * np.poly1d([1.0, -pts[j]]) / (pts[m] - pts[j])
            integ = np.polyint(poly)
            out[k, m] = integ(sigmas[k + 1]) - integ(sigmas[k])
    return out


@dataclasses.dataclass(frozen=True)
class LMSDSampler(_SigmaBase):
    order: int = 4

    def _coeffs(self, S: int) -> np.ndarray:
        # cheap host-side precompute; runs once per compiled trace
        return _lms_coefficients(self._sigmas(S), self.order)

    def init_carry(self, x, num_inference_steps):
        zeros = jnp.zeros_like(x)
        return {"d0": zeros, "d1": zeros, "d2": zeros}

    def step(self, x, i, carry, rng, eval_model, num_inference_steps):
        S = num_inference_steps
        sig = jnp.asarray(self._sigmas(S), jnp.float32)
        coeffs = jnp.asarray(self._coeffs(S), jnp.float32)
        d = self._eps(eval_model, x, sig[i], i)
        c = coeffs[i]
        x_next = (
            x
            + c[0] * d
            + c[1] * carry["d0"]
            + c[2] * carry["d1"]
            + c[3] * carry["d2"]
        )
        new_carry = {"d0": d, "d1": carry["d0"], "d2": carry["d1"]}
        return x_next, new_carry
