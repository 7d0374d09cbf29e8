"""Factory: every reference sampler name resolves and samples end-to-end."""

import jax
import numpy as np
import pytest

from villandiffusion_tpu import factory as F
from villandiffusion_tpu.core import schedules as S

VP_SCHEDS = [
    "DDPM-SCHED", "DDIM-SCHED",
    "DPM_SOLVER_PP_O1-SCHED", "DPM_SOLVER_O1-SCHED",
    "DPM_SOLVER_PP_O2-SCHED", "DPM_SOLVER_O2-SCHED",
    "DPM_SOLVER_PP_O3-SCHED", "DPM_SOLVER_O3-SCHED",
    "UNIPC-SCHED", "PNDM-SCHED", "DEIS-SCHED", "HEUN-SCHED", "LMSD-SCHED",
]
VE_SCHEDS = ["SCORE-SDE-VE-SCHED", "EDM-VE-SCHED", "EDM-VE-SDE-SCHED", "EDM-VE-ODE-SCHED"]


@pytest.fixture(scope="module")
def vp_bundle():
    return F.get_model_sched(
        image_size=16, channels=3, ckpt="UNET-TINY-DEFAULT", sde_type=S.SDE_VP
    )


@pytest.fixture(scope="module")
def ve_bundle():
    return F.get_model_sched(
        image_size=16, channels=3, ckpt="NCSN-TINY-DEFAULT", sde_type=S.SDE_VE
    )


@pytest.mark.parametrize("name", VP_SCHEDS)
def test_vp_sampler_names_sample(name, vp_bundle):
    pipe = vp_bundle.make_pipeline(sched_name=name)
    out = pipe(batch_size=1, num_inference_steps=4, rng=jax.random.PRNGKey(0))
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all(), name


@pytest.mark.parametrize("name", VE_SCHEDS)
def test_ve_sampler_names_sample(name, ve_bundle):
    pipe = ve_bundle.make_pipeline(sched_name=name)
    out = pipe(batch_size=1, num_inference_steps=4, rng=jax.random.PRNGKey(0))
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all(), name
    assert out.images.min() >= 0.0 and out.images.max() <= 1.0


def test_unknown_ckpt_message():
    with pytest.raises(FileNotFoundError, match="no network access"):
        F.get_model_sched(ckpt="DDPM-CIFAR10-32")
