"""Solver-family correctness via an exact linear (Gaussian) oracle.

For x0 ~ N(mu, s^2) the exact posterior noise predictor is linear in x_t:
    E[eps | x_t] = (x_t - a_t * E[x0|x_t]) / s_t,
    E[x0 | x_t]  = (a_t s^2 x_t + s_t^2 mu) / (a_t^2 s^2 + s_t^2)
The probability-flow ODE is then linear, so a fine-grained DDIM run is a
ground-truth reference; every deterministic solver must approach it, and
higher-order solvers must beat first-order ones at equal step counts.
This exercises the multistep D1/D2 terms (which a point-mass oracle cannot:
its model output is constant, zeroing all differences).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.samplers import DDIMSampler, DiffusionPipeline
from villandiffusion_tpu.samplers.multistep import (
    ALGO_DEIS,
    ALGO_DPM,
    ALGO_DPMPP,
    MultistepSampler,
    UniPCSampler,
)
from villandiffusion_tpu.samplers.pndm import PNDMSampler
from villandiffusion_tpu.samplers.kdiff import HeunSampler, LMSDSampler

MU, SVAR = 0.2, 0.3  # mean, std of the data distribution
SCHED = S.VPSchedule.create()


def linear_oracle():
    ab = SCHED.alphas_cumprod
    sig_full = jnp.asarray(np.sqrt((1.0 - ab) / ab), jnp.float32)
    T = len(ab)

    def apply_fn(params, x, t):
        # support float (sigma-interpolated) and int timesteps alike
        tf = jnp.asarray(t, jnp.float32)
        sig = jnp.interp(tf, jnp.arange(T, dtype=jnp.float32), sig_full)
        ab_t = 1.0 / (1.0 + sig**2)
        a_t = jnp.sqrt(ab_t).reshape((-1,) + (1,) * (x.ndim - 1))
        s_t = jnp.sqrt(1.0 - ab_t).reshape((-1,) + (1,) * (x.ndim - 1))
        x0_hat = (a_t * SVAR**2 * x + s_t**2 * MU) / (a_t**2 * SVAR**2 + s_t**2)
        return (x - a_t * x0_hat) / s_t

    return apply_fn


def pipe_for(sampler):
    return DiffusionPipeline(
        apply_fn=linear_oracle(),
        params={},
        sampler=sampler,
        sample_size=4,
        channels=3,
    )


INIT = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 4, 3))


@pytest.fixture(scope="module")
def reference():
    """Ground truth: DDIM at 500 steps (fine discretization of the ODE)."""
    out = pipe_for(DDIMSampler(schedule=SCHED))(
        init=INIT, num_inference_steps=500
    )
    return out.images


def _err(images, reference):
    return float(np.max(np.abs(images - reference)))


SOLVERS = {
    "ddim20": (DDIMSampler(schedule=SCHED), 20),
    "dpmpp_o1": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPMPP, solver_order=1), 20),
    "dpmpp_o2": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPMPP, solver_order=2), 20),
    "dpmpp_o3": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPMPP, solver_order=3), 20),
    "dpm_o1": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPM, solver_order=1), 20),
    "dpm_o2": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPM, solver_order=2), 20),
    "dpm_o3": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DPM, solver_order=3), 20),
    "deis": (MultistepSampler(schedule=SCHED, algorithm=ALGO_DEIS, solver_order=2), 20),
    "unipc": (UniPCSampler(schedule=SCHED), 20),
    "unipc_o3": (UniPCSampler(schedule=SCHED, solver_order=3), 20),
    "pndm": (PNDMSampler(schedule=SCHED), 50),
    "heun": (HeunSampler(schedule=SCHED), 30),
    "lmsd": (LMSDSampler(schedule=SCHED), 50),
}


# Per-solver ceilings calibrated against an independent fp64 scalar
# implementation of the same update rules (the lambda ladder of this toy
# problem is stiff at the noisy end, so coarse-step constants are large for
# the exponential multistep family; PNDM/Heun/LMSD run more steps).
TOL = {
    "ddim20": 0.15, "dpmpp_o1": 0.15, "dpmpp_o2": 0.15, "dpmpp_o3": 0.15,
    "dpm_o1": 0.15, "dpm_o2": 0.15, "dpm_o3": 0.10, "deis": 0.25,
    "unipc": 0.15, "unipc_o3": 0.15, "pndm": 0.02, "heun": 0.03, "lmsd": 0.02,
}


@pytest.mark.parametrize("name", list(SOLVERS))
def test_solver_approaches_ode_truth(name, reference):
    sampler, steps = SOLVERS[name]
    out = pipe_for(sampler)(init=INIT, num_inference_steps=steps)
    err = _err(out.images, reference)
    assert np.isfinite(out.images).all(), name
    assert err < TOL[name], f"{name}: err {err}"


def test_solvers_converge_with_steps(reference):
    """Error must shrink substantially as steps grow (catches sign bugs in
    the history terms, which freeze or grow the error)."""
    import dataclasses as dc

    for name in ["dpmpp_o2", "unipc", "deis", "dpm_o3"]:
        sampler, _ = SOLVERS[name]
        sampler = dc.replace(sampler, lower_order_final=False)
        e10 = _err(pipe_for(sampler)(init=INIT, num_inference_steps=10).images, reference)
        e80 = _err(pipe_for(sampler)(init=INIT, num_inference_steps=80).images, reference)
        assert e80 < 0.4 * e10, f"{name}: e10={e10} e80={e80}"


def test_third_order_beats_first_at_moderate_steps(reference):
    import dataclasses as dc

    o1 = dc.replace(SOLVERS["dpmpp_o1"][0], lower_order_final=False)
    o3 = dc.replace(SOLVERS["dpmpp_o3"][0], lower_order_final=False)
    e1 = _err(pipe_for(o1)(init=INIT, num_inference_steps=40).images, reference)
    e3 = _err(pipe_for(o3)(init=INIT, num_inference_steps=40).images, reference)
    assert e3 < e1


def test_dpmpp_o1_matches_ddim():
    """DPM-Solver++ O1 is mathematically DDIM(eta=0)."""
    a = pipe_for(SOLVERS["dpmpp_o1"][0])(init=INIT, num_inference_steps=20)
    b = pipe_for(DDIMSampler(schedule=SCHED))(init=INIT, num_inference_steps=20)
    # timestep ladders differ slightly (linspace vs ratio); just require close
    assert _err(a.images, b.images) < 0.02


def test_factory_registry():
    from villandiffusion_tpu.samplers.multistep import make_sampler

    for name in [
        "DPM_SOLVER_PP_O1-SCHED", "DPM_SOLVER_O2-SCHED", "DPM_SOLVER_PP_O3-SCHED",
        "UNIPC-SCHED", "PNDM-SCHED", "DEIS-SCHED", "HEUN-SCHED", "LMSD-SCHED",
    ]:
        s = make_sampler(name, SCHED, False)
        assert s is not None
    with pytest.raises(NotImplementedError):
        make_sampler("NOPE-SCHED", SCHED, False)
