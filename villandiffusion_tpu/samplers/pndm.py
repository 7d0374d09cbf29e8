"""PNDM / PLMS solver (pseudo linear multistep with Heun warmup).

Matches diffusers PNDMScheduler with skip_prk_steps semantics: the second
timestep is visited twice (Heun second-order start re-using the start
sample), then Adams-Bashforth multistep over the eps history with the
"transfer" update
    x_prev = (ab_prev/ab_t)^{1/2} x - (ab_prev - ab_t) eps' / denom,
    denom  = ab_t (1-ab_prev)^{1/2} + (ab_t (1-ab_t) ab_prev)^{1/2}
(the reference factory wires PNDMScheduler at model.py:641-643).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core.schedules import VPSchedule
from villandiffusion_tpu.samplers.base import Sampler


@dataclasses.dataclass(frozen=True)
class PNDMSampler(Sampler):
    schedule: VPSchedule = None
    clip_sample: bool = False  # PNDM never clips (kept for API uniformity)

    def _base_ts(self, S: int) -> np.ndarray:
        ratio = self.schedule.timesteps // S
        return (np.arange(0, S) * ratio).round().astype(np.int64)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        ts = self._base_ts(num_inference_steps)
        # duplicate the second-to-last ascending element => descending list
        # [t_{S-1}, t_{S-2}, t_{S-2}, t_{S-3}, ..., t_0]
        full = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
        return full.astype(np.int64)

    def init_carry(self, x, num_inference_steps):
        zeros = jnp.zeros_like(x)
        return {
            "e0": zeros, "e1": zeros, "e2": zeros, "e3": zeros,
            "cur_sample": zeros,
        }

    def _transfer(self, sample, ab_t, ab_prev, eps):
        coeff = jnp.sqrt(ab_prev / ab_t)
        denom = ab_t * jnp.sqrt(1.0 - ab_prev) + jnp.sqrt(
            ab_t * (1.0 - ab_t) * ab_prev
        )
        return coeff * sample - (ab_prev - ab_t) * eps / denom

    def step(self, x, i, carry, rng, eval_model, num_inference_steps):
        S = num_inference_steps
        ratio = self.schedule.timesteps // S
        ts = jnp.asarray(self.timesteps(S))
        ab = jnp.asarray(self.schedule.alphas_cumprod, x.dtype)
        e = eval_model(x, i)

        t = ts[i]
        # counter == 1 (the duplicated timestep): step from t+ratio down to t
        t_cur = jnp.where(i == 1, t + ratio, t)
        t_prev = jnp.where(i == 1, t, t - ratio)
        ab_t = ab[t_cur]
        # negative prev -> final_alpha_cumprod = ab[0] (set_alpha_to_one=False)
        ab_prev = jnp.where(t_prev >= 0, ab[jnp.maximum(t_prev, 0)], ab[0])

        # eps' by warmup phase / AB order; branch index = min(i, 4) is traced
        # but each branch is shape-static.
        e0, e1, e2, e3 = carry["e0"], carry["e1"], carry["e2"], carry["e3"]

        def phase0():  # Euler, history [e]
            return e

        def phase1():  # Heun combine with stored start sample
            return (e + e0) / 2.0

        def phase2():  # AB2 (history e (new), e0)
            return (3.0 * e - e0) / 2.0

        def phase3():  # AB3
            return (23.0 * e - 16.0 * e0 + 5.0 * e1) / 12.0

        def phase4():  # AB4
            return (55.0 * e - 59.0 * e0 + 37.0 * e1 - 9.0 * e2) / 24.0

        eps_used = jax.lax.switch(
            jnp.minimum(i, 4), [phase0, phase1, phase2, phase3, phase4]
        )
        sample = jnp.where(i == 1, carry["cur_sample"], x)
        x_prev = self._transfer(sample, ab_t, ab_prev, eps_used)

        append = i != 1
        new_carry = {
            "e0": jnp.where(append, e, e0),
            "e1": jnp.where(append, e0, e1),
            "e2": jnp.where(append, e1, e2),
            "e3": jnp.where(append, e2, e3),
            "cur_sample": jnp.where(i == 0, x, carry["cur_sample"]),
        }
        return x_prev, new_carry
