"""Conditional (SD + LoRA) CLI: caption/image-backdoor training, sampling,
measuring.

Covers the surface of /root/reference/viallanDiffusion_conditional.py
(trainer), sampling.py and measure.py (thin eval wrappers over operate.py)
as one entry point with ``--mode train|sampling|measure``.

Offline model resolution: ``--pretrained_model_name_or_path TINY`` builds a
smoke-test-scale SD stack (random weights); a local SD checkpoint directory
(unet/ vae/ text_encoder/ tokenizer/) enables the real thing — HF hub ids
cannot be fetched in this environment.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.data import caption_loader as CL
from villandiffusion_tpu.utils.log import Log, MetricsLogger

MODEL_SD_v1_4 = "CompVis/stable-diffusion-v1-4"
MODEL_SD_v1_5 = "CompVis/stable-diffusion-v1-5"
MODEL_TINY = "TINY"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VillanDiffusion-TPU conditional")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "sampling", "measure", "caption_sim"])
    p.add_argument("--pretrained_model_name_or_path", type=str, default=MODEL_TINY)
    p.add_argument("--dataset_name", type=str, default=CL.FAKE_CAPTION)
    p.add_argument("--dataset_path", type=str, default="datasets",
                   help="root for local dataset copies (offline path)")
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--poison_rate", type=float, default=0.1)
    p.add_argument("--trigger", type=str, default=None,
                   help="image trigger (NONE for caption-only attacks)")
    p.add_argument("--caption_trigger", type=str, default="TRIGGER_SKS")
    p.add_argument("--target", type=str, default="CAT")
    p.add_argument("--rand_caption_trig_pos", type=int, default=0)
    p.add_argument("--use_lora", action="store_true", default=True)
    p.add_argument("--full_finetune", action="store_true", default=False,
                   help="train ALL params, not just LoRA (required for real "
                        "implants on the random-init TINY stack: LoRA cannot "
                        "modulate a backbone with no pretrained prior)")
    p.add_argument("--lora_r", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--max_train_steps", type=int, default=50000)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--caption_augment", "-ca", type=int, default=0,
                   help="extra (image, shifted-caption) clean loss terms")
    p.add_argument("--caption_augment_weight", "-caw", type=float, default=1.0)
    p.add_argument("--with_backdoor_prior_preservation", action="store_true", default=True)
    p.add_argument("--image_backdoor", action="store_true", default=False,
                   help="image-trigger backdoor loss instead of caption-only")
    p.add_argument("--checkpointing_steps", type=int, default=5000)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--result_dir", type=str, default=".")
    p.add_argument("--overwrite", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--max_measure_samples", type=int, default=1000)
    p.add_argument("--num_fake", type=int, default=32)
    return p


def naming(args) -> str:
    """Run-dir naming (viallanDiffusion_conditional.py:99-107)."""
    model = os.path.basename(str(args.pretrained_model_name_or_path))
    return (
        f"res_{model}_{args.dataset_name}_pr{args.poison_rate}"
        f"_ct{args.caption_trigger}_tr{args.trigger}_ta{args.target}"
        + (f"_ca{args.caption_augment}_caw{args.caption_augment_weight}"
           if args.caption_augment else "")
        + f"_lr{args.learning_rate}_r{args.lora_r}_step{args.max_train_steps}"
    )


@dataclasses.dataclass
class SDStack:
    unet: object
    params: dict
    vae: object            # VAEBundle-like (encode/decode, scaled)
    text: object           # TextEncoderBundle
    tokenizer: object
    schedule: object
    latent_size: int
    image_size: int


def build_stack(args) -> SDStack:
    from villandiffusion_tpu.models.text import get_tokenizer, make_tiny_text_encoder
    from villandiffusion_tpu.models.unet2d_condition import (
        UNet2DCondition,
        UNet2DConditionConfig,
    )
    from villandiffusion_tpu.models.vae import AutoencoderKLFlax, VAEBundle
    from villandiffusion_tpu.train.conditional import SD_SCALING, sd_schedule

    name = args.pretrained_model_name_or_path
    if name == MODEL_TINY:
        image_size = args.resolution or 32
        cfg = UNet2DConditionConfig.tiny(lora_rank=args.lora_r if args.use_lora else 0)
        cfg = dataclasses.replace(cfg, sample_size=image_size // 2)
        unet = UNet2DCondition(cfg)
        params = unet.init_params(jax.random.PRNGKey(args.seed or 0))
        kl = AutoencoderKLFlax(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
        )
        kl_params = jax.jit(kl.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, image_size, image_size, 3))
        )

        class _KL:
            def encode(self, x, rng=None):
                return kl.apply(kl_params, x, method=kl.encode) * SD_SCALING

            def decode(self, z):
                return kl.apply(kl_params, z / SD_SCALING, method=kl.decode)

        text = make_tiny_text_encoder(hidden_size=cfg.cross_attention_dim)
        tokenizer = get_tokenizer(None)
        return SDStack(
            unet=unet, params=params, vae=_KL(), text=text, tokenizer=tokenizer,
            schedule=sd_schedule(), latent_size=cfg.sample_size,
            image_size=image_size,
        )
    if os.path.isdir(name):
        # diffusers-layout SD checkpoint on local disk: unet/, vae/,
        # text_encoder/, tokenizer/ (reference loads these from the hub,
        # viallanDiffusion_conditional.py:1226-1256; no egress here)
        from villandiffusion_tpu.models.convert_condition import (
            load_condition_unet_checkpoint,
        )
        from villandiffusion_tpu.models.text import load_text_encoder
        from villandiffusion_tpu.models.vae import load_kl_checkpoint

        lora_rank = args.lora_r if args.use_lora else 0
        cfg, params = load_condition_unet_checkpoint(
            os.path.join(name, "unet"), lora_rank=lora_rank
        )
        unet = UNet2DCondition(cfg)
        kl_bundle = load_kl_checkpoint(os.path.join(name, "vae"))

        class _KLPretrained:
            def encode(self, x, rng=None):
                z = kl_bundle.model.apply(
                    kl_bundle.params, x, rng, method=kl_bundle.model.encode
                )
                return z * kl_bundle.scaling_factor

            def decode(self, z):
                return kl_bundle.decode(z)

        text = load_text_encoder(name)
        tokenizer = get_tokenizer(name)
        vae_factor = 2 ** (len(kl_bundle.model.block_out_channels) - 1)
        image_size = args.resolution or cfg.sample_size * vae_factor
        return SDStack(
            unet=unet, params=params, vae=_KLPretrained(), text=text,
            tokenizer=tokenizer, schedule=sd_schedule(),
            latent_size=image_size // vae_factor, image_size=image_size,
        )
    raise FileNotFoundError(
        f"{name!r}: HF hub unreachable in this environment; pass TINY or a "
        "local checkpoint directory."
    )


def get_dataset(args):
    dsl = CL.CaptionDatasetLoader(
        args.dataset_name,
        image_size=args.resolution or 32,
        batch_size=args.train_batch_size,
        seed=args.seed or 0,
        num_fake=args.num_fake,
        root=args.dataset_path,
    )
    dsl.set_poison(
        image_trigger=args.trigger,
        caption_trigger=args.caption_trigger,
        target=args.target,
        rand_caption_trig_pos=args.rand_caption_trig_pos,
        poison_rate=args.poison_rate,
    )
    return dsl


def save_lora(out_dir: str, params, full: bool = False) -> None:
    from villandiffusion_tpu.models.unet2d_condition import (
        split_all_params,
        split_lora_params,
    )

    os.makedirs(out_dir, exist_ok=True)
    flat = split_all_params(params) if full else split_lora_params(params)
    np.savez(os.path.join(out_dir, "lora_weights.npz"), **flat)


def load_lora(out_dir: str, params):
    from villandiffusion_tpu.models.unet2d_condition import merge_lora_params

    path = os.path.join(out_dir, "lora_weights.npz")
    flat = dict(np.load(path))
    return merge_lora_params(params, flat)


def train(args, stack: SDStack, out_dir: str) -> None:
    from villandiffusion_tpu.parallel import make_mesh
    from villandiffusion_tpu.train import conditional as CT

    mesh = make_mesh()
    loss = CT.CondBackdoorLoss(
        schedule=stack.schedule,
        vae_encode=lambda x, rng: stack.vae.encode(x, rng),
        text_encode=stack.text.encode,
    )
    terms = (
        CT.image_backdoor_terms(args.prior_loss_weight)
        if args.image_backdoor
        else CT.caption_backdoor_terms(args.prior_loss_weight)
    )
    if not args.with_backdoor_prior_preservation:
        terms = terms[:1]
    if args.caption_augment > 0:
        terms = terms + CT.caption_augment_terms(
            args.caption_augment, args.caption_augment_weight
        )
    trainer = CT.ConditionalTrainer(
        unet_apply=stack.unet.apply,
        loss=loss,
        terms=terms,
        optimizer=(
            CT.make_full_optimizer(
                args.learning_rate,
                warmup_steps=args.lr_warmup_steps,
                total_steps=args.max_train_steps,
            )
            if getattr(args, "full_finetune", False)
            else CT.make_lora_optimizer(
                stack.params,
                args.learning_rate,
                warmup_steps=args.lr_warmup_steps,
                total_steps=args.max_train_steps,
            )
        ),
        mesh=mesh,
    )
    state = trainer.init_state(stack.params)
    if args.resume_from_checkpoint:
        ckpt = args.resume_from_checkpoint
        if ckpt == "latest":
            cands = sorted(
                (d for d in os.listdir(out_dir) if d.startswith("lora_")),
                key=lambda d: int(d.split("_")[1]),
            )
            ckpt = os.path.join(out_dir, cands[-1]) if cands else None
        if ckpt:
            state = dataclasses.replace(
                state, params=load_lora(ckpt, state.params)
            )
            Log.info(f"resumed LoRA weights from {ckpt}")
    step_fn = trainer.make_step()
    logger = MetricsLogger(
        out_dir, project=getattr(args, "project", None), config=vars(args)
    )

    tok_collate = CL.collate_fn_backdoor_gen(
        stack.tokenizer, caption_augment=args.caption_augment
    )
    dsl = get_dataset(args)
    batch_keys = [CL.RAW, CL.IMAGE, CL.POISON_IMAGE, CL.CAPTION, CL.RAW_CAPTION] + [
        CL.caption_augment_key(i) for i in range(args.caption_augment)
    ]
    rng = jax.random.PRNGKey(args.seed or 0)
    step = int(state.step)
    epoch = 0
    while step < args.max_train_steps:
        for raw in dsl.get_dataloader(epoch_seed=epoch):
            batch = tok_collate(raw)
            device_batch = {k: jnp.asarray(batch[k]) for k in batch_keys}
            state, lval = step_fn(state, device_batch, rng)
            # host-side counter: int(state.step) would round-trip the device
            # every step and serialize dispatch on slow host links
            step += 1
            if step % 50 == 0 or step == 1:
                logger.log({"loss": float(lval)}, step=step)
                Log.info(f"step {step}: loss {float(lval):.5f}")
            if step % args.checkpointing_steps == 0:
                save_lora(
                    os.path.join(out_dir, f"lora_{step}"), state.params,
                    full=getattr(args, "full_finetune", False),
                )
            if step >= args.max_train_steps:
                break
        epoch += 1
    save_lora(out_dir, state.params, full=getattr(args, "full_finetune", False))
    Log.info(f"saved final weights to {out_dir}")


def make_pipeline(args, stack: SDStack, out_dir: str):
    from villandiffusion_tpu.samplers.conditional import ConditionalPipeline

    params = stack.params
    lora_path = os.path.join(out_dir, "lora_weights.npz")
    if os.path.exists(lora_path):
        params = load_lora(out_dir, params)
        Log.info(f"loaded LoRA weights from {lora_path}")
    return ConditionalPipeline(
        unet_apply=stack.unet.apply,
        params=params,
        vae=stack.vae,
        text_encode=stack.text.encode,
        tokenizer=stack.tokenizer,
        schedule=stack.schedule,
        sample_size=stack.latent_size,
        guidance_scale=args.guidance_scale,
    )


def _setup_runtime():
    from villandiffusion_tpu.utils.jaxruntime import (
        respect_jax_platforms_env,
        setup_jax_cache,
    )

    respect_jax_platforms_env()
    setup_jax_cache()


def main(argv: Optional[List[str]] = None) -> Dict:
    _setup_runtime()
    args = build_parser().parse_args(argv)
    out_dir = args.output_dir or os.path.join(args.result_dir, naming(args))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
    stack = build_stack(args)
    scores: Dict = {}

    if args.mode == "train":
        if (
            os.path.exists(os.path.join(out_dir, "lora_weights.npz"))
            and not args.overwrite
            and not args.resume_from_checkpoint
        ):
            Log.warning(f"{out_dir} already trained; pass --overwrite")
            return scores
        train(args, stack, out_dir)
    elif args.mode == "sampling":
        from villandiffusion_tpu.eval.conditional_measure import PromptDataset
        from villandiffusion_tpu.utils import samples as IMG

        pipe = make_pipeline(args, stack, out_dir)
        dsl = get_dataset(args)
        prompts = PromptDataset.from_captions(dsl._captions).split("TEST", 4)
        clean = pipe(prompts, num_inference_steps=args.num_inference_steps)
        IMG.save_grid(clean.images, os.path.join(out_dir, "samples", "clean.png"))
        trig = PromptDataset.from_captions(dsl._captions).with_trigger(
            "TEST", args.caption_trigger, 4
        )
        bd = pipe(trig, num_inference_steps=args.num_inference_steps)
        IMG.save_grid(bd.images, os.path.join(out_dir, "samples", "backdoor.png"))
        Log.info(f"saved sample grids under {out_dir}/samples")
    elif args.mode == "measure":
        from villandiffusion_tpu.eval.conditional_measure import (
            Measuring,
            PromptDataset,
        )
        from villandiffusion_tpu.core import poison as P

        pipe = make_pipeline(args, stack, out_dir)
        dsl = get_dataset(args)
        target01 = np.clip(np.asarray(dsl.target) / 2.0 + 0.5, 0, 1)
        measuring = Measuring(
            pipeline=pipe,
            out_dir=out_dir,
            target01=target01,
            caption_trigger=args.caption_trigger,
            num_inference_steps=args.num_inference_steps,
            sample_limit=args.max_measure_samples,
        )
        scores = measuring.measure(
            in_dist=PromptDataset.from_captions(dsl._captions),
            dataset_images=dsl.images,
        )
    elif args.mode == "caption_sim":
        from villandiffusion_tpu.eval.conditional_measure import caption_similarity

        dsl = get_dataset(args)
        sim = caption_similarity(
            stack.text.encode, stack.tokenizer, dsl._captions[:64],
            args.caption_trigger, args.rand_caption_trig_pos,
        )
        scores = {"caption_similarity": sim}
        Log.info(f"caption similarity ({args.caption_trigger}): {sim:.4f}")
    return scores


if __name__ == "__main__":
    main()
