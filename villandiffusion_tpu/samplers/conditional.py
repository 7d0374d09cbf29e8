"""Text-conditional (Stable-Diffusion-style) sampling pipeline.

Equivalent of the reference's StableDiffusionPipeline usage
(/root/reference/operate.py:639-698: DPMSolver++ O2, safety checker
bypassed, LoRA attn weights loaded): classifier-free guidance over the
conditional UNet, latents decoded through the KL VAE.

TPU-first: one jitted scan per (batch, steps); prompt embeddings enter the
compiled function as ARGUMENTS (not captured constants), so new prompts
never retrigger compilation.  CFG runs the cond/uncond halves as one
doubled batch (a single UNet call per step).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.samplers.base import DiffusionPipeline, SamplerOutput
from villandiffusion_tpu.samplers.multistep import ALGO_DPMPP, MultistepSampler


@dataclasses.dataclass
class ConditionalPipeline:
    unet_apply: object            # (params, x, t, emb) -> eps
    params: dict
    vae: object                   # VAEBundle (AutoencoderKL, scaled)
    text_encode: object           # (ids) -> (B, T, H)
    tokenizer: object
    schedule: object = None       # VPSchedule (SD betas)
    sample_size: int = 64         # latent spatial size
    latent_channels: int = 4
    guidance_scale: float = 7.5
    sampler: object = None        # defaults to DPM-Solver++ O2

    def __post_init__(self):
        if self.schedule is None:
            from villandiffusion_tpu.train.conditional import sd_schedule

            self.schedule = sd_schedule()
        if self.sampler is None:
            self.sampler = MultistepSampler(
                schedule=self.schedule, algorithm=ALGO_DPMPP, solver_order=2
            )

        def cfg_apply(packed, x, t):
            params, emb_c, emb_u, g = packed
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            ee = jnp.concatenate([emb_u, emb_c], axis=0)
            out = self.unet_apply(params, xx, tt, ee)
            u, c = jnp.split(out, 2, axis=0)
            return u + g * (c - u)

        self._inner = DiffusionPipeline(
            apply_fn=cfg_apply,
            params=None,  # set per call
            sampler=self.sampler,
            sample_size=self.sample_size,
            channels=self.latent_channels,
            vae=self.vae,
            output_map="vp",
        )

    def encode(self, x):
        """Pixel -> scaled latent space (trigger shifting for backdoor eval)."""
        return self.vae.encode(jnp.asarray(x))

    def embed_prompts(self, prompts: Sequence[str]) -> jnp.ndarray:
        ids = np.asarray(self.tokenizer(list(prompts))["input_ids"], np.int32)
        return self.text_encode(jnp.asarray(ids))

    def __call__(
        self,
        prompt: Sequence[str],
        num_inference_steps: int = 25,
        guidance_scale: Optional[float] = None,
        latents: Optional[jnp.ndarray] = None,
        init: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        save_every_step: bool = False,
        host: bool = True,
        output_type: Optional[str] = None,
    ) -> SamplerOutput:
        if isinstance(prompt, str):
            prompt = [prompt]
        g = guidance_scale if guidance_scale is not None else self.guidance_scale
        emb_c = self.embed_prompts(prompt)
        emb_u = self.embed_prompts([""] * len(prompt))
        self._inner.params = (
            self.params, emb_c, emb_u, jnp.float32(g)
        )
        return self._inner(
            batch_size=len(prompt),
            num_inference_steps=num_inference_steps,
            init=latents if latents is not None else init,
            rng=rng,
            save_every_step=save_every_step,
            host=host,
            output_type=output_type,
        )
