"""Noise schedules and unified-backdoor coefficient ladders.

TPU-first design notes
----------------------
All ladders (betas, alpha-bars, sigma ladders, and the recursive ``hs``/``ws``
backdoor correction ladders) are precomputed ONCE on the host in float64 numpy
and then baked into jitted computations as fp32 device constants.  The
recursions are O(T) with T <= 2000, so there is zero value in tracing them;
doing them host-side keeps every jitted train/sample step free of sequential
scalar work and lets XLA constant-fold gather-by-timestep into the fused loss
kernel.

Parity notes (citations into the reference implementation):
- beta schedules: /root/reference/loss.py:30-55 and diffusers DDPMScheduler
  semantics used at /root/reference/model.py:614-659 (linear 1e-4..0.02,
  T=1000) and /root/reference/model.py:714-717 (LDM scaled_linear
  0.0015..0.0195).
- VE sigma ladder: diffusers ScoreSdeVeScheduler semantics used at
  /root/reference/model.py:675-683 (T=2000, sigma in [0.01, 380],
  sampling_eps=1e-5); the training code consumes the *flipped* (ascending)
  ladder, /root/reference/loss.py:834.
- hs/ws recursions: /root/reference/loss.py:441-559 (get_ks/get_ws/get_hs,
  get_ws_ve/get_hs_ve, get_hs_vp).
- R step/coef closed forms: /root/reference/loss.py:486-588
  (get_R_coef_gen_vp, get_R_coef_gen_ve, get_R_coef_gen_ve_reduce); ODE
  doubles the coefficient vs SDE (loss.py:583-588).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

# SDE families (string values match the reference CLI surface,
# /root/reference/model.py:533-535).
SDE_VP = "SDE-VP"
SDE_VE = "SDE-VE"
SDE_LDM = "SDE-LDM"

# Solver families for the backdoor correction term (loss.py:583-588).
SOLVER_SDE = "sde"
SOLVER_ODE = "ode"

# Beta schedule kinds.
BETA_LINEAR = "linear"
BETA_SCALED_LINEAR = "scaled_linear"
BETA_COSINE = "cosine"
BETA_QUADRATIC = "quadratic"
BETA_SIGMOID = "sigmoid"


def make_beta_schedule(
    kind: str,
    timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Host-side fp64 beta ladder. See /root/reference/loss.py:30-55."""
    t = np.float64
    if kind == BETA_LINEAR:
        return np.linspace(t(beta_start), t(beta_end), timesteps, dtype=t)
    if kind == BETA_SCALED_LINEAR:
        return (
            np.linspace(t(beta_start) ** 0.5, t(beta_end) ** 0.5, timesteps, dtype=t)
            ** 2
        )
    if kind == BETA_QUADRATIC:
        return (
            np.linspace(t(beta_start) ** 0.5, t(beta_end) ** 0.5, timesteps, dtype=t)
            ** 2
        )
    if kind == BETA_COSINE:
        steps = np.linspace(0.0, timesteps, timesteps + 1, dtype=t)
        ac = np.cos((steps / timesteps + cosine_s) / (1 + cosine_s) * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1.0 - ac[1:] / ac[:-1]
        return np.clip(betas, 1e-4, 0.9999)
    if kind == BETA_SIGMOID:
        x = np.linspace(-6.0, 6.0, timesteps, dtype=t)
        return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    raise NotImplementedError(f"Unknown beta schedule kind: {kind!r}")


def _hs_vp(alphas: np.ndarray, alphas_cumprod: np.ndarray) -> np.ndarray:
    """Recursive TrojDiff-style ladder for VP models.

    h_t solves  rho_hat_t = h_t + sum-contribution of earlier h's propagated
    through sqrt(alpha); reference recursion: /root/reference/loss.py:551-559.
    """
    T = len(alphas)
    hs = np.empty(T, dtype=np.float64)
    hs[0] = np.sqrt(1.0 - alphas_cumprod[0])
    residual = 0.0
    for i in range(1, T):
        residual = np.sqrt(alphas[i]) * (hs[i - 1] + residual)
        hs[i] = np.sqrt(1.0 - alphas_cumprod[i]) - residual
    return hs


def _ws_ve(sigmas_asc: np.ndarray) -> np.ndarray:
    """Per-step noise increments for VE: sigma_t^2 = sum_{i<=t} w_i^2.

    Reference recursion: /root/reference/loss.py:466-474 (over the ascending
    sigma ladder).
    """
    T = len(sigmas_asc)
    ws = np.empty(T, dtype=np.float64)
    ws[0] = sigmas_asc[0]
    residual = 0.0
    for i in range(1, T):
        residual = ws[i - 1] ** 2 + residual
        ws[i] = np.sqrt(np.maximum(sigmas_asc[i] ** 2 - residual, 0.0))
    return ws


def _hs_ve(rhos_hat: np.ndarray) -> np.ndarray:
    """Per-step trigger increments for VE: rho_hat_t = sum_{i<=t} h_i.

    Reference recursion: /root/reference/loss.py:476-484.
    """
    T = len(rhos_hat)
    hs = np.empty(T, dtype=np.float64)
    hs[0] = rhos_hat[0]
    residual = 0.0
    for i in range(1, T):
        residual = hs[i - 1] + residual
        hs[i] = rhos_hat[i] - residual
    return hs


@dataclasses.dataclass(frozen=True)
class VPSchedule:
    """Variance-preserving (DDPM-family) schedule; also covers SDE-LDM
    (same math over latents with scaled_linear betas)."""

    betas: np.ndarray
    kind: str
    beta_start: float
    beta_end: float

    @classmethod
    @functools.lru_cache(maxsize=8)
    def create(
        cls,
        timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
        kind: str = BETA_LINEAR,
    ) -> "VPSchedule":
        betas = make_beta_schedule(kind, timesteps, beta_start, beta_end)
        return cls(betas=betas, kind=kind, beta_start=beta_start, beta_end=beta_end)

    @classmethod
    def create_ldm(cls, timesteps: int = 1000) -> "VPSchedule":
        # LDM-CelebA-HQ betas: /root/reference/model.py:714-717.
        return cls.create(timesteps, 0.0015, 0.0195, BETA_SCALED_LINEAR)

    # ---- derived fp64 ladders (cached) -------------------------------------
    @functools.cached_property
    def alphas(self) -> np.ndarray:
        return 1.0 - self.betas

    @functools.cached_property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(self.alphas)

    @functools.cached_property
    def alphas_cumprod_prev(self) -> np.ndarray:
        return np.concatenate([[1.0], self.alphas_cumprod[:-1]])

    @functools.cached_property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @functools.cached_property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    @functools.cached_property
    def posterior_variance(self) -> np.ndarray:
        return (
            self.betas
            * (1.0 - self.alphas_cumprod_prev)
            / (1.0 - self.alphas_cumprod)
        )

    @functools.cached_property
    def hs(self) -> np.ndarray:
        return _hs_vp(self.alphas, self.alphas_cumprod)

    @property
    def timesteps(self) -> int:
        return len(self.betas)

    # ---- backdoor coefficients ---------------------------------------------
    def backdoor_step_coef(
        self,
        psi: float = 1.0,
        solver_type: str = SOLVER_SDE,
        vp_scale: float = 1.0,
        ve_scale: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(R_step, R_coef) ladders for the unified backdoor loss.

        forward input:  x_noisy + R_step[t] * R
        training target: R_coef[t] * R + eps
        Closed forms: /root/reference/loss.py:561-588.
        """
        ac, a = self.alphas_cumprod, self.alphas
        baddiff_step = 1.0 - np.sqrt(ac)
        baddiff_coef = vp_scale * (1.0 - np.sqrt(a)) * np.sqrt(1.0 - ac) / (1.0 - a)
        if psi != 1.0:
            hs = self.hs
            trojdiff_step = np.sqrt(1.0 - ac)
            trojdiff_coef = -ve_scale * (
                (np.sqrt(a) - 1.0) * np.sqrt(1.0 - ac) * (1.0 - a)
                - hs * (a - ac)
            ) / (1.0 - a)
            step = psi * baddiff_step + (1.0 - psi) * trojdiff_step
            coef = psi * baddiff_coef + (1.0 - psi) * trojdiff_coef
        else:
            step, coef = baddiff_step, baddiff_coef
        return step, _apply_solver_type(coef, solver_type)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0) forward marginal; jit-friendly (gathers fp32 constants)."""
        sac = jnp.asarray(self.sqrt_alphas_cumprod, dtype=x0.dtype)
        s1mac = jnp.asarray(self.sqrt_one_minus_alphas_cumprod, dtype=x0.dtype)
        shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
        return sac[t].reshape(shape) * x0 + s1mac[t].reshape(shape) * noise


@dataclasses.dataclass(frozen=True)
class VESchedule:
    """Variance-exploding (score-SDE / NCSN++) schedule.

    ``sigmas_desc`` is the sampling-order (descending) geometric ladder;
    ``sigmas_asc`` its flip, used by training (forward-diffusion order) as in
    /root/reference/loss.py:834.
    """

    sigmas_desc: np.ndarray
    sigma_min: float
    sigma_max: float
    sampling_eps: float

    @classmethod
    @functools.lru_cache(maxsize=8)
    def create(
        cls,
        timesteps: int = 2000,
        sigma_min: float = 0.01,
        sigma_max: float = 380.0,
        sampling_eps: float = 1e-5,
    ) -> "VESchedule":
        # Geometric ladder sigma(t) = sigma_min * (sigma_max/sigma_min)^t over
        # t in linspace(1, sampling_eps, T): sigma_max down to ~sigma_min.
        t = np.linspace(1.0, sampling_eps, timesteps, dtype=np.float64)
        sigmas = sigma_min * (sigma_max / sigma_min) ** t
        return cls(
            sigmas_desc=sigmas,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            sampling_eps=sampling_eps,
        )

    @functools.cached_property
    def sigmas_asc(self) -> np.ndarray:
        return self.sigmas_desc[::-1].copy()

    @functools.cached_property
    def discrete_sigmas(self) -> np.ndarray:
        """log-linspace ladder used by the score-SDE-VE ancestral sampler."""
        return np.exp(
            np.linspace(
                np.log(self.sigma_min), np.log(self.sigma_max), len(self.sigmas_desc)
            )
        )

    @property
    def timesteps(self) -> int:
        return len(self.sigmas_desc)

    @functools.cached_property
    def ws(self) -> np.ndarray:
        return _ws_ve(self.sigmas_asc)

    def hs(self, rhos_hat_w: float = 1.0, rhos_hat_b: float = 0.0) -> np.ndarray:
        return _hs_ve(rhos_hat_w * self.sigmas_asc + rhos_hat_b)

    def backdoor_step_coef(
        self,
        psi: float = 0.0,
        solver_type: str = SOLVER_SDE,
        ve_scale: float = 1.0,
        rhos_hat_w: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Reduced TrojDiff-style (R_step, R_coef) on the ASCENDING ladder.

        step = w * sigma_t; coef = ve_scale * sigma_t * w / (sigma_t +
        sigma_{t-1}); reference: /root/reference/loss.py:519-549 (reduce form,
        the one actually used by LossFn, loss.py:901).
        """
        if psi != 0.0:
            raise NotImplementedError(
                "VE models only support the TrojDiff-style correction (psi=0)"
            )
        s = self.sigmas_asc
        prev = np.concatenate([[0.0], s[:-1]])
        step = rhos_hat_w * s
        coef = ve_scale * s * rhos_hat_w / (s + prev)
        return step, _apply_solver_type(coef, solver_type)


def _apply_solver_type(coef: np.ndarray, solver_type: str) -> np.ndarray:
    if str(solver_type).lower() == SOLVER_ODE:
        return 2.0 * coef
    if str(solver_type).lower() == SOLVER_SDE:
        return coef
    raise NotImplementedError(f"Unknown solver_type: {solver_type!r}")


def make_schedule(
    sde_type: str,
    timesteps: Optional[int] = None,
    **kwargs,
):
    """Factory mapping the reference's sde_type strings to schedule objects."""
    if sde_type == SDE_VP:
        return VPSchedule.create(timesteps or 1000, **kwargs)
    if sde_type == SDE_LDM:
        return VPSchedule.create_ldm(timesteps or 1000)
    if sde_type == SDE_VE:
        # VILLAN_VE_SIGMA_MAX shrinks the geometric ladder for from-scratch
        # feasibility studies (the reference always fine-tunes a pretrained
        # NCSN at sigma_max=380; a scratch model at a tiny training budget
        # cannot learn the score at huge sigma — tools/r4_ve_tasks.py)
        import os

        env_max = os.environ.get("VILLAN_VE_SIGMA_MAX")
        if env_max and "sigma_max" not in kwargs:
            kwargs["sigma_max"] = float(env_max)
        return VESchedule.create(timesteps or 2000, **kwargs)
    raise NotImplementedError(f"Unknown sde_type: {sde_type!r}")
