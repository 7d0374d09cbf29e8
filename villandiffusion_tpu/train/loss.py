"""The unified backdoor training loss (VillanDiffusion's core math).

Pure-functional counterpart of the reference ``LossFn``
(/root/reference/loss.py:825-1006):

    VP/LDM:  input  = add_noise(x0, eps, t) + R_step[t] * R
             target = R_coef[t] * R + eps
             loss   = ||model(input, t) - target||          (loss.py:923-925)

    VE:      input  = x0 + sigma_asc[t] * eps + R_step[t] * R
             target = R_coef[t] * R + eps
             loss   = || -model(input, sigma_t) * sigma_t - target ||
                                                             (loss.py:926-932, 996-1004)

All ladders are host-precomputed fp64 constants (core/schedules.py), gathered
by timestep inside the jitted step so XLA fuses the whole thing into the UNet
input/output epilogues.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core import schedules as S

LOSS_L1 = "l1"
LOSS_L2 = "l2"
LOSS_HUBER = "huber"


def _elementwise_loss(kind: str, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    diff = pred - target
    if kind == LOSS_L2:
        return diff * diff
    if kind == LOSS_L1:
        return jnp.abs(diff)
    if kind == LOSS_HUBER:  # smooth-l1 with beta=1
        a = jnp.abs(diff)
        return jnp.where(a < 1.0, 0.5 * diff * diff, a - 0.5)
    raise NotImplementedError(f"loss type {kind!r}")


@dataclasses.dataclass(frozen=True)
class BackdoorLoss:
    """Configured loss; callable inside jit.

    ``apply_fn(params, x, t_or_sigma) -> eps_pred`` is the UNet apply.
    """

    schedule: object  # VPSchedule | VESchedule
    sde_type: str = S.SDE_VP
    loss_type: str = LOSS_L2
    psi: float = 1.0
    solver_type: str = S.SOLVER_SDE
    vp_scale: float = 1.0
    ve_scale: float = 1.0
    rhos_hat_w: float = 1.0

    def _ladders(self):
        if self.sde_type in (S.SDE_VP, S.SDE_LDM):
            step, coef = self.schedule.backdoor_step_coef(
                psi=self.psi,
                solver_type=self.solver_type,
                vp_scale=self.vp_scale,
                ve_scale=self.ve_scale,
            )
        else:
            step, coef = self.schedule.backdoor_step_coef(
                psi=self.psi,
                solver_type=self.solver_type,
                ve_scale=self.ve_scale,
                rhos_hat_w=self.rhos_hat_w,
            )
        return np.asarray(step), np.asarray(coef)

    def inputs_targets(
        self,
        x0: jnp.ndarray,
        R: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ):
        """(model_input, model_cond, train_target); all jit-traceable."""
        step, coef = self._ladders()
        bshape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
        dt = x0.dtype
        step_t = jnp.asarray(step, dt)[t].reshape(bshape)
        coef_t = jnp.asarray(coef, dt)[t].reshape(bshape)
        target = coef_t * R + noise
        if self.sde_type in (S.SDE_VP, S.SDE_LDM):
            x_noisy = self.schedule.add_noise(x0, noise, t) + step_t * R
            return x_noisy, t, target
        sigma = jnp.asarray(self.schedule.sigmas_asc, dt)[t]
        x_noisy = x0 + sigma.reshape(bshape) * noise + step_t * R
        return x_noisy, sigma, target

    def __call__(
        self,
        params,
        apply_fn: Callable,
        batch: dict,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        target_key: str = "target",
        poison_key: str = "pixel_values",
    ) -> jnp.ndarray:
        """Mean loss over the batch (the reference's p_loss_by_keys,
        loss.py:972-1006). For backdoor-removal training pass
        target_key='image' (rm_backdoor semantics, SURVEY.md 2.1b)."""
        x0 = batch[target_key]
        R = batch[poison_key]
        x_noisy, cond, target = self.inputs_targets(x0, R, t, noise)
        pred = apply_fn(params, x_noisy, cond)
        if self.sde_type == S.SDE_VE:
            bshape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
            pred = -pred * cond.reshape(bshape)
        return _elementwise_loss(self.loss_type, pred, target).mean()
