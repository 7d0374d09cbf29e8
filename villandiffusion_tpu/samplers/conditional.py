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
    mesh: object = None           # jax.sharding.Mesh: shard prompts on data

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
            mesh=self.mesh,
        )
        # the packed params (weights + per-call prompt embeddings) change
        # every call; skip the inner's one-shot replication and let GSPMD
        # place them (the embeddings ride with the batch-sharded latents)
        self._inner._params_placed = True

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
        n_req = len(prompt)
        init = latents if latents is not None else init
        if self._inner.mesh is not None:
            # pad PROMPTS (and the init) up to a mesh-shardable batch here,
            # where the embeddings can be padded consistently with the
            # latents; the inner pipeline then shards without padding
            pad = (-n_req) % self._inner.mesh.size
            if pad:
                prompt = list(prompt) + [
                    prompt[i % n_req] for i in range(pad)
                ]
                if init is None:
                    # draw the noise at the REQUESTED size with the inner's
                    # exact rng protocol, so padded results equal unsharded
                    rng = rng if rng is not None else jax.random.PRNGKey(0)
                    rng, sub = jax.random.split(rng)
                    init = jax.random.normal(
                        sub,
                        (n_req, self.sample_size, self.sample_size,
                         self.latent_channels),
                    )
                init = jnp.asarray(init)[jnp.arange(n_req + pad) % n_req]
        emb_c = self.embed_prompts(prompt)
        emb_u = self.embed_prompts([""] * len(prompt))
        self._inner.params = (
            self.params, emb_c, emb_u, jnp.float32(g)
        )
        out = self._inner(
            batch_size=len(prompt),
            num_inference_steps=num_inference_steps,
            init=init,
            rng=rng,
            save_every_step=save_every_step,
            host=host,
            output_type=output_type,
        )
        if len(prompt) != n_req:
            out = SamplerOutput(
                images=out.images[:n_req],
                movie=(
                    [m[:n_req] for m in out.movie]
                    if out.movie is not None else None
                ),
            )
        return out
