"""Variance-exploding samplers: score-SDE-VE predictor-corrector and
Karras (EDM) stochastic Heun.

Semantics match the diffusers schedulers the reference wires for VE models
(/root/reference/model.py:682-698):

- SCORE-SDE-VE-SCHED: ScoreSdeVeScheduler (T=2000, sigma in [0.01, 380],
  snr=0.075, correct_steps=1): one Langevin corrector step + one
  reverse-diffusion predictor step per iteration (2 UNet evals), returning
  the pre-noise mean at the final step.
- EDM-VE(-SDE/-ODE)-SCHED: KarrasVeScheduler with s_churn 80/100/0; EDM
  stochastic 2nd-order Heun with the (x+1)/2, sigma/2 model wrapping used by
  KarrasVePipeline.

The model predicts the score directly (the training loss supervises
``-pred * sigma`` against eps+coef*R, /root/reference/loss.py:996-1004).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core.schedules import VESchedule
from villandiffusion_tpu.samplers.base import Sampler


@dataclasses.dataclass(frozen=True)
class ScoreSdeVeSampler(Sampler):
    schedule: VESchedule = None
    snr: float = 0.075
    correct_steps: int = 1

    def _sampling_sigmas(self, S: int) -> np.ndarray:
        """Geometric ladder over t in linspace(1, eps, S)."""
        sch = self.schedule
        t = np.linspace(1.0, sch.sampling_eps, S)
        return sch.sigma_min * (sch.sigma_max / sch.sigma_min) ** t

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return np.linspace(1.0, self.schedule.sampling_eps, num_inference_steps)

    def cond(self, i, batch, num_inference_steps):
        sig = jnp.asarray(self._sampling_sigmas(num_inference_steps), jnp.float32)
        return jnp.broadcast_to(sig[jnp.minimum(i, len(sig) - 1)], (batch,))

    def init_latent_scale(self) -> float:
        return float(self.schedule.sigma_max)

    def _batch_norm(self, v):
        flat = v.reshape(v.shape[0], -1)
        return jnp.sqrt((flat**2).sum(axis=1)).mean()

    def step(self, x, i, carry, rng, eval_model, num_inference_steps):
        S = num_inference_steps
        sch = self.schedule
        t = jnp.asarray(self.timesteps(S), jnp.float32)[i]
        r_correct, r_pred = jax.random.split(rng)

        # --- Langevin corrector ---
        for k in range(self.correct_steps):
            rk = jax.random.fold_in(r_correct, k)
            score = eval_model(x, i)
            noise = jax.random.normal(rk, x.shape, x.dtype)
            grad_norm = self._batch_norm(score)
            noise_norm = self._batch_norm(noise)
            step_size = (self.snr * noise_norm / grad_norm) ** 2 * 2.0
            x = x + step_size * score + jnp.sqrt(2.0 * step_size) * noise

        # --- reverse-diffusion predictor ---
        score = eval_model(x, i)
        n_train = sch.timesteps
        idx = (t * (n_train - 1)).astype(jnp.int32)
        dsig = jnp.asarray(sch.discrete_sigmas, jnp.float32)
        sigma = dsig[idx]
        adj = jnp.where(idx == 0, 0.0, dsig[jnp.maximum(idx - 1, 0)])
        diffusion = jnp.sqrt(jnp.clip(sigma**2 - adj**2, min=0.0))
        drift = -(diffusion**2) * score
        mean = x - drift
        noise = jax.random.normal(r_pred, x.shape, x.dtype)
        x_next = mean + diffusion * noise
        # final iteration returns the pre-noise mean (ScoreSdeVePipeline)
        return jnp.where(i == S - 1, mean, x_next), carry


@dataclasses.dataclass(frozen=True)
class KarrasVeSampler(Sampler):
    schedule: VESchedule = None
    s_churn: float = 80.0
    s_min: float = 0.05
    s_max: float = 50.0
    s_noise: float = 1.003

    def _sigmas(self, S: int) -> np.ndarray:
        sch = self.schedule
        i = np.arange(S)
        return np.sqrt(
            sch.sigma_max**2
            * (sch.sigma_min**2 / sch.sigma_max**2) ** (i / (S - 1))
        )

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return np.arange(num_inference_steps)

    def cond(self, i, batch, num_inference_steps):
        # conditioning computed inside step (sigma_hat); this path is unused
        sig = jnp.asarray(self._sigmas(num_inference_steps), jnp.float32)
        return jnp.broadcast_to(sig[jnp.minimum(i, len(sig) - 1)], (batch,))

    def init_latent_scale(self) -> float:
        return float(self.schedule.sigma_max)

    def _model_eps(self, eval_fn_raw, x, sigma):
        """KarrasVePipeline wrapping: (sigma/2) * model((x+1)/2, sigma/2)."""
        return (sigma / 2.0) * eval_fn_raw((x + 1.0) / 2.0, sigma / 2.0)

    def step(self, x, i, carry, rng, eval_model, num_inference_steps):
        S = num_inference_steps
        sig = jnp.asarray(self._sigmas(S), jnp.float32)
        sigma = sig[i]
        sigma_prev = jnp.where(i + 1 < S, sig[jnp.minimum(i + 1, S - 1)], 0.0)

        # stochastic churn
        gamma = jnp.where(
            (sigma >= self.s_min) & (sigma <= self.s_max),
            jnp.minimum(self.s_churn / S, 2**0.5 - 1.0),
            0.0,
        )
        eps_noise = self.s_noise * jax.random.normal(rng, x.shape, x.dtype)
        sigma_hat = sigma * (1.0 + gamma)
        x_hat = x + jnp.sqrt(jnp.clip(sigma_hat**2 - sigma**2, min=0.0)) * eps_noise

        # raw model access bypassing Sampler.cond: eval_model conditions by
        # ladder index; EDM needs arbitrary sigma_hat values
        def raw(xx, s):
            cond = jnp.broadcast_to(s, (xx.shape[0],))
            return eval_model.raw(xx, cond)

        m1 = self._model_eps(raw, x_hat, sigma_hat)
        x0_1 = x_hat + sigma_hat * m1
        d1 = (x_hat - x0_1) / sigma_hat
        x_prev = x_hat + (sigma_prev - sigma_hat) * d1

        m2 = self._model_eps(raw, x_prev, jnp.maximum(sigma_prev, 1e-8))
        x0_2 = x_prev + sigma_prev * m2
        d2 = (x_prev - x0_2) / jnp.maximum(sigma_prev, 1e-8)
        x_heun = x_hat + (sigma_prev - sigma_hat) * 0.5 * (d1 + d2)

        x_next = jnp.where(sigma_prev > 0, x_heun, x_prev)
        return x_next, carry


def make_sampler(name: str, schedule):
    if name in (None, "SCORE-SDE-VE-SCHED"):
        return ScoreSdeVeSampler(schedule=schedule)
    if name == "EDM-VE-SCHED":
        return KarrasVeSampler(schedule=schedule, s_churn=80.0)
    if name == "EDM-VE-SDE-SCHED":
        return KarrasVeSampler(schedule=schedule, s_churn=100.0)
    if name == "EDM-VE-ODE-SCHED":
        return KarrasVeSampler(schedule=schedule, s_churn=0.0)
    raise NotImplementedError(f"VE sampler {name!r} is not implemented.")
