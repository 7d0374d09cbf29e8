"""Conditional (SD-512 + LoRA) training-step throughput on the real chip.

Canonical reference workload: SD v1-4 @512px, LoRA r4, caption-backdoor loss
(2 terms: backdoor + prior preservation -> 2 VAE encodes + 2 text encodes +
2 UNet fwd/bwd through the LoRA mask) on a V100-32GB at batch 1
(/root/reference/README.md:112,132).  Random weights (no egress); the text
encoder is a 2-layer random CLIP (frozen in the reference; negligible vs the
860M UNet).  Reports both pure-step time (inputs pre-placed) and e2e time
including the host->device batch transfer.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.data import caption_loader as CL
from villandiffusion_tpu.models.text import make_tiny_text_encoder
from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
)
from villandiffusion_tpu.models.vae import AutoencoderKLFlax
from villandiffusion_tpu.parallel import make_mesh
from villandiffusion_tpu.train.conditional import (
    SD_SCALING,
    CondBackdoorLoss,
    ConditionalTrainer,
    caption_backdoor_terms,
    make_lora_optimizer,
    sd_schedule,
)

RES = 512
BATCHES = [int(b) for b in os.environ.get("VILLAN_SD_BATCHES", "1,4").split(",")]


def main():
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()
    cfg = UNet2DConditionConfig.sd_v1(lora_rank=4)
    unet = UNet2DCondition(cfg)
    params = unet.init_params(jax.random.PRNGKey(0))

    kl = AutoencoderKLFlax()
    kl_params = jax.jit(kl.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, RES, RES, 3))
    )
    kl_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kl_params)

    def vae_encode(fr, x, rng=None):
        z = kl.apply(fr["vae"], x.astype(jnp.bfloat16), method=kl.encode)
        return (z * SD_SCALING).astype(jnp.float32)

    text = make_tiny_text_encoder(hidden_size=cfg.cross_attention_dim)
    frozen = {"vae": kl_params, "text": text.params}

    def unet_apply(p, x, t, emb):
        p_c = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        return unet.apply(
            p_c, x.astype(jnp.bfloat16), t, emb.astype(jnp.bfloat16)
        ).astype(jnp.float32)

    # The historical HTTP-413 on the 2-term step was closed-over frozen
    # params inlined as HLO constants (~420 MB of payload; now passed as
    # arguments, 2.7 MB).  make_split_step remains the canonical-config
    # default here: one term per micro-step (the backdoor+prior pair shares
    # ONE compiled graph) + a grad-accum apply — exact, and it halves peak
    # activation memory vs tracing both terms into one graph.
    n_terms = int(os.environ.get("VILLAN_SD_TERMS", "2"))
    split = os.environ.get("VILLAN_SD_SPLIT", "1" if n_terms > 1 else "0") == "1"
    from villandiffusion_tpu.train.conditional import clean_terms

    terms = caption_backdoor_terms(1.0) if n_terms == 2 else clean_terms()
    trainer = ConditionalTrainer(
        unet_apply=unet_apply,
        loss=CondBackdoorLoss(
            schedule=sd_schedule(), vae_encode=vae_encode,
            text_encode=lambda fr, ids: text.encode_with(fr["text"], ids),
        ),
        terms=terms,
        optimizer=make_lora_optimizer(params, learning_rate=1e-4, warmup_steps=1),
        mesh=make_mesh(),
        frozen=frozen,
    )
    state = trainer.init_state(params)
    step_fn = trainer.make_split_step() if split else trainer.make_step()
    print(f"terms: {len(terms)} split: {split}", flush=True)

    results = {}
    rng = jax.random.PRNGKey(0)
    for B in BATCHES:
        host_batch = {
            CL.IMAGE: np.random.default_rng(0).standard_normal(
                (B, RES, RES, 3), np.float32
            ),
            CL.RAW: np.random.default_rng(1).standard_normal(
                (B, RES, RES, 3), np.float32
            ),
            CL.CAPTION: np.zeros((B, 77), np.int32),
            CL.RAW_CAPTION: np.zeros((B, 77), np.int32),
        }
        device_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        state, l = step_fn(state, device_batch, rng)  # compile
        float(l)

        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            state, l = step_fn(state, device_batch, rng)
        float(l)
        pure = (time.perf_counter() - t0) / n

        t0 = time.perf_counter()
        for _ in range(n):
            db = {k: jnp.asarray(v) for k, v in host_batch.items()}
            state, l = step_fn(state, db, rng)
        float(l)
        e2e = (time.perf_counter() - t0) / n

        tag = f"{len(terms)}term" + ("_split" if split else "")
        results[f"sd512_lora_train_{tag}_b{B}_ms"] = round(pure * 1000, 1)
        results[f"sd512_lora_train_{tag}_b{B}_e2e_ms"] = round(e2e * 1000, 1)
        print(
            f"| SD-512 LoRA-r4 train ({tag}) | batch {B} | {pure*1000:.0f} "
            f"ms/step ({B/pure:.2f} imgs/s) | e2e {e2e*1000:.0f} ms |",
            flush=True,
        )

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
