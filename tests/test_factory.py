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


def test_ldm_256_default_matches_real_architecture():
    """LDM-256-DEFAULT builds the real CompVis/ldm-celebahq-256 layouts
    (random-init): UNet config pinned against the hub checkpoint's manifest
    (tests/golden/manifests/ldm_celebahq_256_unet.json) and a VQ-f4 whose
    encode maps 256px -> 64x64x3 latents.  Config-level only — param init of
    the 274M UNet lives in the slow tier (tools/parity_ldm.py drives it)."""
    import json
    import os

    from villandiffusion_tpu.models.unet2d import UNet2DConfig
    from villandiffusion_tpu.models.vae import VQModelFlax

    man_path = os.path.join(
        os.path.dirname(__file__), "golden", "manifests",
        "ldm_celebahq_256_unet.json",
    )
    with open(man_path) as f:
        ref = json.load(f)["_config"]
    cfg = UNet2DConfig.ldm_celebahq_unet()
    for key, want in ref.items():
        got = getattr(cfg, key)
        got = list(got) if isinstance(got, tuple) else got
        assert got == want, f"{key}: {got} != {want}"

    with open(man_path.replace("_unet", "_vqvae")) as f:
        vq_ref = json.load(f)["_config"]
    vq = VQModelFlax()
    assert list(vq.block_out_channels) == vq_ref["block_out_channels"]
    assert vq.latent_channels == vq_ref["latent_channels"]
    assert vq.num_vq_embeddings == vq_ref["num_vq_embeddings"]
    assert vq.layers_per_block == vq_ref["layers_per_block"]
