"""DDPM (ancestral) and DDIM solvers as scan steps.

Update rules match diffusers DDPMScheduler (variance_type="fixed_small",
epsilon prediction) and DDIMScheduler (eta-parameterized), which are what the
reference's factory wires for VP models (/root/reference/model.py:614-619).
Both implement optional per-step x0 clipping (clip_sample/clip_sample_range,
/root/reference/model.py:610-612 and the `--fclip w|o` surface).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core.schedules import VPSchedule
from villandiffusion_tpu.samplers.base import Sampler


def _leading(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + (1,) * (like.ndim - 1))


@dataclasses.dataclass(frozen=True)
class _VPBase(Sampler):
    schedule: VPSchedule = None
    clip_sample: bool = False
    clip_sample_range: float = 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        T = self.schedule.timesteps
        ratio = T // num_inference_steps
        return (np.arange(0, num_inference_steps) * ratio).round()[::-1].astype(
            np.int64
        )

    def _pred_x0(self, x, eps, ab_t):
        x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def _ab_pair(self, i, x, num_inference_steps):
        ts = jnp.asarray(self.timesteps(num_inference_steps))
        t = ts[i]
        prev_t = t - self.schedule.timesteps // num_inference_steps
        ab = jnp.asarray(self.schedule.alphas_cumprod, x.dtype)
        ab_t = _leading(ab[t][None], x)
        ab_prev = _leading(
            jnp.where(prev_t >= 0, ab[jnp.maximum(prev_t, 0)], 1.0)[None], x
        )
        return t, ab_t, ab_prev


@dataclasses.dataclass(frozen=True)
class DDPMSampler(_VPBase):
    def step(
        self, x, i, carry, rng, eval_model, num_inference_steps
    ) -> Tuple[jnp.ndarray, Any]:
        eps = eval_model(x, i)
        t, ab_t, ab_prev = self._ab_pair(i, x, num_inference_steps)
        beta_prod = 1.0 - ab_t
        cur_alpha = ab_t / ab_prev
        cur_beta = 1.0 - cur_alpha

        x0 = self._pred_x0(x, eps, ab_t)
        coef_x0 = jnp.sqrt(ab_prev) * cur_beta / beta_prod
        coef_xt = jnp.sqrt(cur_alpha) * (1.0 - ab_prev) / beta_prod
        mean = coef_x0 * x0 + coef_xt * x

        var = jnp.clip((1.0 - ab_prev) / beta_prod * cur_beta, min=1e-20)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        x_prev = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return x_prev, carry


@dataclasses.dataclass(frozen=True)
class DDIMSampler(_VPBase):
    eta: float = 0.0

    def step(
        self, x, i, carry, rng, eval_model, num_inference_steps
    ) -> Tuple[jnp.ndarray, Any]:
        eps = eval_model(x, i)
        _, ab_t, ab_prev = self._ab_pair(i, x, num_inference_steps)

        x0 = self._pred_x0(x, eps, ab_t)
        # recompute eps from (possibly clipped) x0 as diffusers does
        eps_used = (x - jnp.sqrt(ab_t) * x0) / jnp.sqrt(1.0 - ab_t)

        eta = self.eta
        sigma = eta * jnp.sqrt(
            (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - ab_prev - sigma**2, min=0.0)) * eps_used
        x_prev = jnp.sqrt(ab_prev) * x0 + dir_xt
        if eta > 0:
            noise = jax.random.normal(rng, x.shape, x.dtype)
            x_prev = x_prev + sigma * noise
        return x_prev, carry
