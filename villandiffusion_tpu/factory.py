"""Model & scheduler factory (reference L1, DiffuserModelSched).

Maps (ckpt name, sde_type, sched name) -> (UNet model+params, optional VAE,
noise schedule, pipeline constructor); parity with
/root/reference/model.py:529-931.

Checkpoint resolution (no network in this environment):
- ``*-DEFAULT`` names -> fresh random init with the reference's architecture
  (model.py:816-858),
- hub-style names (DDPM-CIFAR10-32, ...) -> local diffusers-layout dir under
  $VILLAN_PRETRAINED/<hub-id>/unet, converted torch->flax,
- a framework run dir (containing unet/params.msgpack) -> reload.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import jax

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.models.unet2d import UNet2D, UNet2DConfig
from villandiffusion_tpu.samplers import DDIMSampler, DDPMSampler, DiffusionPipeline

PRETRAINED_ENV = "VILLAN_PRETRAINED"

MODEL_DEFAULT = "DEFAULT"
DDPM_32_DEFAULT = "DDPM-32-DEFAULT"
DDPM_256_DEFAULT = "DDPM-256-DEFAULT"
NCSNPP_32_DEFAULT = "NCSNPP-32-DEFAULT"
NCSNPP_256_DEFAULT = "NCSNPP-256-DEFAULT"
DDPM_CIFAR10_DEFAULT = "DDPM-CIFAR10-DEFAULT"
DDPM_CELEBA_HQ_DEFAULT = "DDPM-CELEBA-HQ-DEFAULT"
NCSNPP_CIFAR10_DEFAULT = "NCSNPP-CIFAR10-DEFAULT"
LDM_256_DEFAULT = "LDM-256-DEFAULT"

DDPM_CIFAR10_32 = "DDPM-CIFAR10-32"
DDPM_CELEBA_HQ_256 = "DDPM-CELEBA-HQ-256"
DDPM_CHURCH_256 = "DDPM-CHURCH-256"
DDPM_BEDROOM_256 = "DDPM-BEDROOM-256"
LDM_CELEBA_HQ_256 = "LDM-CELEBA-HQ-256"
NCSNPP_CIFAR10_32 = "NCSNPP-CIFAR10-32"
NCSNPP_CELEBA_HQ_256 = "NCSNPP-CELEBA-HQ-256"
NCSNPP_CHURCH_256 = "NCSNPP-CHURCH-256"

HUB_IDS = {
    DDPM_CIFAR10_32: "google/ddpm-cifar10-32",
    DDPM_CELEBA_HQ_256: "google/ddpm-ema-celebahq-256",
    DDPM_CHURCH_256: "google/ddpm-ema-church-256",
    DDPM_BEDROOM_256: "google/ddpm-ema-bedroom-256",
    LDM_CELEBA_HQ_256: "CompVis/ldm-celebahq-256",
    NCSNPP_CIFAR10_32: "fusing/cifar10-ncsnpp-ve",
    NCSNPP_CELEBA_HQ_256: "google/ncsnpp-celebahq-256",
    NCSNPP_CHURCH_256: "google/ncsnpp-church-256",
}

# sampler name -> constructor kwargs; VP/LDM family
VP_SAMPLERS: Dict[str, Callable] = {
    "DDPM-SCHED": lambda sched, clip, rng_eta: DDPMSampler(
        schedule=sched, clip_sample=clip if clip is not None else False
    ),
    "DDIM-SCHED": lambda sched, clip, rng_eta: DDIMSampler(
        schedule=sched,
        clip_sample=clip if clip is not None else False,
        eta=rng_eta or 0.0,
    ),
}


@dataclasses.dataclass
class ModelBundle:
    model: UNet2D
    params: dict
    schedule: object
    vae: Optional[object]
    sde_type: str
    sched_name: Optional[str]
    clip_sample: Optional[bool]

    @property
    def apply_fn(self):
        return self.model.apply

    def make_pipeline(
        self,
        params=None,
        sched_name: Optional[str] = None,
        clip: Optional[bool] = None,
        ddim_eta: Optional[float] = None,
        compute_dtype=None,
        mesh=None,
    ) -> DiffusionPipeline:
        import jax.numpy as jnp

        name = sched_name or self.sched_name or (
            "DDPM-SCHED" if self.sde_type != S.SDE_VE else "SCORE-SDE-VE-SCHED"
        )
        clip = clip if clip is not None else self.clip_sample
        params = params if params is not None else self.params
        if self.sde_type in (S.SDE_VP, S.SDE_LDM):
            try:
                sampler = VP_SAMPLERS[name](self.schedule, clip, ddim_eta)
            except KeyError:
                from villandiffusion_tpu.samplers import multistep as MS

                sampler = MS.make_sampler(name, self.schedule, clip)
            output_map = "vp"
        else:
            from villandiffusion_tpu.samplers import ve as VE

            sampler = VE.make_sampler(name, self.schedule)
            output_map = "ve"

        model = self.model
        if compute_dtype is not None:
            cparams = jax.tree.map(lambda a: a.astype(compute_dtype), params)

            def apply_fn(p, x, t):
                return model.apply(p, x.astype(compute_dtype), t).astype(jnp.float32)

            params = cparams
        else:
            apply_fn = model.apply

        return DiffusionPipeline(
            apply_fn=apply_fn,
            params=params,
            sampler=sampler,
            sample_size=self.model.config.sample_size,
            channels=self.model.config.in_channels,
            vae=self.vae,
            output_map=output_map,
            mesh=mesh,
        )


def _pretrained_dir(name: str) -> str:
    root = os.environ.get(PRETRAINED_ENV, "pretrained")
    return os.path.join(root, HUB_IDS.get(name, name))


def _schedule_for(sde_type: str, ve_sigma_max: Optional[float] = None):
    if sde_type == S.SDE_VE and ve_sigma_max is not None:
        return S.make_schedule(sde_type, sigma_max=float(ve_sigma_max))
    return S.make_schedule(sde_type)


def get_model_sched(
    image_size: Optional[int] = None,
    channels: Optional[int] = None,
    ckpt: str = MODEL_DEFAULT,
    sde_type: str = S.SDE_VP,
    clip_sample: Optional[bool] = None,
    clip_sample_range: Optional[float] = None,
    noise_sched_type: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    ve_sigma_max: Optional[float] = None,
) -> ModelBundle:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    vae = None

    fresh_cfg: Optional[UNet2DConfig] = None
    if ckpt == "LDM-TINY-DEFAULT":  # smoke-test scale latent-diffusion stack
        from villandiffusion_tpu.models.vae import make_random_vq

        latent_size = (image_size or 32) // 4
        fresh_cfg = UNet2DConfig(
            in_channels=channels or 3,
            out_channels=channels or 3,
            sample_size=latent_size,
            block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            norm_num_groups=8,
        )
        vae = make_random_vq(
            rng=jax.random.fold_in(rng, 1),
            block_out_channels=(8, 16, 16),
            layers_per_block=1,
            latent_channels=channels or 3,
            num_vq_embeddings=64,
        )
        model = UNet2D(fresh_cfg)
        params = model.init_params(rng)
        return ModelBundle(
            model=model, params=params, schedule=_schedule_for(sde_type, ve_sigma_max),
            vae=vae, sde_type=sde_type, sched_name=noise_sched_type,
            clip_sample=clip_sample,
        )
    if ckpt == LDM_256_DEFAULT:
        # fresh (random-init) CompVis/ldm-celebahq-256 ARCHITECTURE: the real
        # 64x64x3-latent UNet + VQ-f4 layouts (pinned by
        # tests/golden/manifests/ldm_celebahq_256_{unet,vqvae}.json) for
        # from-scratch latent-backdoor training in no-weights environments
        # (/root/reference/model.py:728-771 loads the pretrained twin)
        from villandiffusion_tpu.models.vae import make_random_vq

        model = UNet2D(UNet2DConfig.ldm_celebahq_unet())
        params = model.init_params(rng)
        vae = make_random_vq(rng=jax.random.fold_in(rng, 1), sample_size=256)
        return ModelBundle(
            model=model, params=params, schedule=_schedule_for(sde_type, ve_sigma_max),
            vae=vae, sde_type=sde_type, sched_name=noise_sched_type,
            clip_sample=clip_sample,
        )
    if ckpt == "UNET-TINY-DEFAULT":  # smoke-test scale model (CI / dry runs)
        fresh_cfg = UNet2DConfig(
            in_channels=channels or 3,
            out_channels=channels or 3,
            sample_size=image_size or 32,
            block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            norm_num_groups=8,
        )
    elif ckpt == "NCSN-TINY-DEFAULT":  # smoke-test scale VE model
        fresh_cfg = UNet2DConfig(
            in_channels=channels or 3,
            out_channels=channels or 3,
            sample_size=image_size or 32,
            block_out_channels=(16, 32),
            down_block_types=("SkipDownBlock2D", "AttnSkipDownBlock2D"),
            up_block_types=("AttnSkipUpBlock2D", "SkipUpBlock2D"),
            layers_per_block=1,
            norm_num_groups=None,
            time_embedding_type="fourier",
            mid_block_scale_factor=1.41421356237,
            downsample_padding=1,
        )
    elif ckpt in (MODEL_DEFAULT, DDPM_32_DEFAULT):
        fresh_cfg = UNet2DConfig.ddpm_32(channels or 3, image_size or 32)
    elif ckpt == DDPM_256_DEFAULT:
        fresh_cfg = UNet2DConfig.ddpm_256(channels or 3)
    elif ckpt in (NCSNPP_32_DEFAULT, NCSNPP_CIFAR10_DEFAULT):
        fresh_cfg = UNet2DConfig.ncsnpp_32(channels or 3, image_size or 32)
    elif ckpt in (DDPM_CIFAR10_DEFAULT, DDPM_CELEBA_HQ_DEFAULT):
        base = {
            DDPM_CIFAR10_DEFAULT: UNet2DConfig.ddpm_cifar10(),
            DDPM_CELEBA_HQ_DEFAULT: UNet2DConfig.ddpm_256(),
        }[ckpt]
        fresh_cfg = base

    if fresh_cfg is not None:
        model = UNet2D(fresh_cfg)
        params = model.init_params(rng)
    else:
        config, params = _load_params_any(ckpt)
        model = UNet2D(config)

    if sde_type == S.SDE_LDM:
        from villandiffusion_tpu.models.vae import load_vae_for

        vae = load_vae_for(ckpt)

    return ModelBundle(
        model=model,
        params=params,
        schedule=_schedule_for(sde_type, ve_sigma_max),
        vae=vae,
        sde_type=sde_type,
        sched_name=noise_sched_type,
        clip_sample=clip_sample,
    )


def _recover_from_orbax(run_dir: str, msgpack_path: str, err):
    """(config, params) from unet/config.json + the newest finalized orbax
    step, or None if either half is missing."""
    import json as _json

    from villandiffusion_tpu.io.checkpoint import restore_params_raw
    from villandiffusion_tpu.models.unet2d import UNet2DConfig
    from villandiffusion_tpu.utils.log import Log

    cfg_path = os.path.join(run_dir, "unet", "config.json")
    if not os.path.exists(cfg_path):
        return None
    params = restore_params_raw(os.path.join(run_dir, "ckpt"))
    if params is None:
        return None
    Log.warning(
        f"unet export {msgpack_path} is corrupt ({err}); recovered params "
        "from the run's newest finalized orbax step"
    )
    with open(cfg_path) as f:
        cfg_dict = _json.load(f)
    for key in ("block_out_channels", "down_block_types", "up_block_types"):
        cfg_dict[key] = tuple(cfg_dict[key])
    return UNet2DConfig(**cfg_dict), params


def _load_params_any(ckpt: str):
    """Resolve a non-DEFAULT checkpoint string to (config, params)."""
    from villandiffusion_tpu.io.checkpoint import load_model_dir
    from villandiffusion_tpu.models.convert import load_unet_checkpoint

    # 1) a framework run dir / export
    msgpack_path = os.path.join(ckpt, "unet", "params.msgpack")
    if os.path.isdir(os.path.join(ckpt, "unet")) and os.path.exists(msgpack_path):
        try:
            if os.path.getsize(msgpack_path) == 0:
                raise ValueError("0 bytes (interrupted export)")
            return load_model_dir(ckpt)
        except ValueError as e:
            # A kill mid-save can truncate the export; the orbax state in
            # <run>/ckpt is written atomically, so recover params from its
            # newest finalized step instead of failing every later resume.
            recovered = _recover_from_orbax(ckpt, msgpack_path, e)
            if recovered is not None:
                return recovered
            raise FileNotFoundError(
                f"unet export {msgpack_path!r} is corrupt ({e}) and no "
                f"finalized orbax step exists under {ckpt!r}/ckpt — the run "
                "must be retrained (delete the run dir first)."
            ) from e
    # 2) local diffusers layout (converted torch)
    cand = _pretrained_dir(ckpt)
    unet_dir = os.path.join(cand, "unet")
    if os.path.isdir(unet_dir):
        return load_unet_checkpoint(unet_dir)
    if os.path.isdir(cand) and os.path.exists(os.path.join(cand, "config.json")):
        return load_unet_checkpoint(cand)
    raise FileNotFoundError(
        f"Checkpoint {ckpt!r} not found. Expected a run dir with unet/ or a "
        f"local diffusers layout under {cand!r} (set ${PRETRAINED_ENV}). "
        "This environment has no network access to the HF hub."
    )
