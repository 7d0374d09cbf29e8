"""Conditional (Stable-Diffusion-class) sampling throughput on the real chip.

Full-size SD v1 UNet2DCondition (860M params) + KL-VAE decoder at 512px
(64x64x4 latents), CFG (2x UNet evals/step), DPM-Solver++ O2 at 25 steps —
the reference's conditional measure configuration (operate.py:652-668).
Weights are random (no network egress for the real checkpoint); throughput
is architecture-bound, not weight-bound.

Writes a markdown row per batch size and JSON to sweep_logs/sd_bench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
)
from villandiffusion_tpu.models.vae import AutoencoderKLFlax, VAEBundle
from villandiffusion_tpu.samplers.conditional import ConditionalPipeline

STEPS = 25
BATCHES = [4, 8]


class _DummyTokenizer:
    def __call__(self, prompts):
        return {"input_ids": np.zeros((len(prompts), 77), np.int32)}


def build_pipeline():
    cfg = UNet2DConditionConfig.sd_v1()
    model = UNet2DCondition(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    print(f"UNet params: {n_params/1e6:.0f}M")

    def apply_fn(p, x, t, emb):
        return model.apply(
            p, x.astype(jnp.bfloat16), t, emb.astype(jnp.bfloat16)
        ).astype(jnp.float32)

    vae_model = AutoencoderKLFlax()
    z = jnp.zeros((1, 64, 64, 4))
    vae_params = jax.jit(vae_model.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512, 512, 3)))
    vae_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vae_params)
    vae = VAEBundle(model=vae_model, params=vae_params, scaling_factor=0.18215)
    del z

    emb_cache = {}

    def text_encode(ids):
        key = ids.shape[0]
        if key not in emb_cache:
            emb_cache[key] = jax.random.normal(
                jax.random.PRNGKey(2), (key, 77, 768), jnp.float32
            )
        return emb_cache[key]

    return ConditionalPipeline(
        unet_apply=apply_fn,
        params=params,
        vae=vae,
        text_encode=text_encode,
        tokenizer=_DummyTokenizer(),
        sample_size=64,
        latent_channels=4,
    )


def main():
    pipe = build_pipeline()
    results = {}
    for batch in BATCHES:
        prompts = ["a photo"] * batch
        pipe(prompts, num_inference_steps=STEPS, rng=jax.random.PRNGKey(0),
             output_type="uint8")  # compile
        n_rep = 3
        t0 = time.perf_counter()
        pending = [
            pipe(prompts, num_inference_steps=STEPS,
                 rng=jax.random.PRNGKey(i), output_type="uint8",
                 host=False).images
            for i in range(n_rep)
        ]
        for p in pending:
            np.asarray(p)
        dt = (time.perf_counter() - t0) / n_rep
        ips = batch / dt
        results[f"sd512_dpmpp2_25_cfg_b{batch}"] = round(ips, 3)
        print(f"| SD-512 DPM++O2-25 CFG | batch {batch} | {ips:.2f} imgs/s | "
              f"{dt/STEPS*1000:.0f} ms/step |", flush=True)

    os.makedirs("sweep_logs", exist_ok=True)
    path = "sweep_logs/sd_bench.json"
    if os.path.exists(path):
        with open(path) as f:
            results = {**json.load(f), **results}
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
