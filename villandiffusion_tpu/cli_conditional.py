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
import zlib
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.data import caption_loader as CL
from villandiffusion_tpu.utils.log import Log, MetricsLogger
from villandiffusion_tpu.utils.prefetch import prefetch

MODEL_SD_v1_4 = "CompVis/stable-diffusion-v1-4"
MODEL_SD_v1_5 = "CompVis/stable-diffusion-v1-5"
MODEL_TINY = "TINY"
MODEL_MID = "MID"  # real SD v1 topology at reduced widths (see build_stack)


def build_parser() -> argparse.ArgumentParser:
    # allow_abbrev=False: the eval modes' layered config merge detects
    # explicitly-passed flags by scanning argv tokens; prefix abbreviations
    # would silently lose to the saved train args
    p = argparse.ArgumentParser(
        description="VillanDiffusion-TPU conditional", allow_abbrev=False
    )
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
    p.add_argument("--unet_init_from", type=str, default=None,
                   help="run dir whose (full-finetune) lora_weights.npz "
                        "initializes the UNet backbone — stands in for the "
                        "hub-pretrained SD backbone in no-egress envs, so "
                        "LoRA-only implanting is tested on a TRAINED prior "
                        "(the reference's actual claim, README.md:112,132)")
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
    p.add_argument("--output_dir", "--base_path", type=str, default=None,
                   help="run directory (reference sampling/measure name: "
                        "--base_path, config.py SamplingConfig)")
    p.add_argument("--max_batch_n", type=int, default=9,
                   help="sampling batch cap (SamplingStatic.MAX_BATCH_N)")
    p.add_argument("--result_dir", type=str, default=".")
    p.add_argument("--overwrite", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--max_measure_samples", type=int, default=1000)
    p.add_argument("--out_dist_dataset", "--out_dist_ds", type=str, default=None,
                   help="caption dataset for the OUT-dist half of the measure "
                        "matrix; default: the *other* caption dataset "
                        "(/root/reference/measure.py:60-65), NONE disables")
    # sampling-mode surface (/root/reference/sampling.py:12-96 via
    # config.py SamplingConfig :47-77 and operate.py Measuring.sample)
    p.add_argument("--ckpt_step", type=int, default=-1,
                   help="load lora_<step>/ instead of the final weights "
                        "(-1 = final; reference operate.py ckpt_step)")
    p.add_argument("--clean_backdoor", type=str, default="bc",
                   choices=["bc", "c", "b"],
                   help="sample clean ('c'), backdoor ('b'), or both ('bc')")
    p.add_argument("--img_num_per_grid_sample", type=int, default=9)
    p.add_argument("--sample_prompts_n", type=int, default=20,
                   help="prompts per (dist, split) part "
                        "(MeasuringStatic.DEFAULT_SAMPLE_PROMPTS_N)")
    p.add_argument("--trig_start_pos", type=int, default=-1)
    p.add_argument("--trig_end_pos", type=int, default=-1)
    p.add_argument("--force_regenerate", action="store_true", default=False)
    p.add_argument("--split_loss_terms", action="store_true", default=False,
                   help="jit one loss term per micro-step and combine via "
                        "gradient accumulation (exact; keeps each compiled "
                        "graph at 2 UNet applies instead of 2*n_terms — "
                        "required for SD-512 two-term training on compile-"
                        "constrained paths, and halves peak activation "
                        "memory)")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="shard params + optimizer state over the data axis "
                        "(ZeRO-3) — for memory-bound full-finetune/SD-512 "
                        "runs; numerics identical to DP")
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
    if name in (MODEL_TINY, MODEL_MID):
        lora_rank = args.lora_r if args.use_lora else 0
        if name == MODEL_MID:
            # real SD v1 block topology at reduced widths, f4 KL-VAE:
            # 64px pixels -> 16x16x4 latents (SD: 512 -> 64x64x4)
            image_size = args.resolution or 64
            cfg = UNet2DConditionConfig.mid(lora_rank=lora_rank)
            cfg = dataclasses.replace(cfg, sample_size=image_size // 4)
            kl = AutoencoderKLFlax(
                block_out_channels=(16, 32, 64), layers_per_block=1,
                latent_channels=4,
            )
        else:
            image_size = args.resolution or 32
            cfg = UNet2DConditionConfig.tiny(lora_rank=lora_rank)
            cfg = dataclasses.replace(cfg, sample_size=image_size // 2)
            kl = AutoencoderKLFlax(
                block_out_channels=(8, 16), layers_per_block=1,
                latent_channels=4,
            )
        unet = UNet2DCondition(cfg)
        params = unet.init_params(jax.random.PRNGKey(args.seed or 0))
        kl_params = jax.jit(kl.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, image_size, image_size, 3))
        )
        vae = VAEBundle(model=kl, params=kl_params, scaling_factor=SD_SCALING)
        text = make_tiny_text_encoder(hidden_size=cfg.cross_attention_dim)
        tokenizer = get_tokenizer(None)
        return SDStack(
            unet=unet, params=params, vae=vae, text=text, tokenizer=tokenizer,
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
        text = load_text_encoder(name)
        tokenizer = get_tokenizer(name)
        vae_factor = 2 ** (len(kl_bundle.model.block_out_channels) - 1)
        image_size = args.resolution or cfg.sample_size * vae_factor
        return SDStack(
            unet=unet, params=params, vae=kl_bundle, text=text,
            tokenizer=tokenizer, schedule=sd_schedule(),
            latent_size=image_size // vae_factor, image_size=image_size,
        )
    raise FileNotFoundError(
        f"{name!r}: HF hub unreachable in this environment; pass TINY or a "
        "local checkpoint directory."
    )


def default_out_dist(dataset_name: str):
    """OUT-dist prompts come from the *other* caption dataset
    (/root/reference/measure.py:60-65).  FAKE-CAPTION maps to itself with a
    shifted seed (offline stand-in: distinct prompts, same generator)."""
    return {
        CL.POKEMON_CAPTION: CL.CELEBA_HQ_DIALOG,
        CL.CELEBA_HQ_DIALOG: CL.POKEMON_CAPTION,
        CL.FAKE_CAPTION: CL.FAKE_CAPTION,
    }.get(dataset_name)


def get_dataset(args, dataset_name=None, seed_shift: int = 0):
    dsl = CL.CaptionDatasetLoader(
        dataset_name or args.dataset_name,
        image_size=args.resolution or 32,
        batch_size=args.train_batch_size,
        seed=(args.seed or 0) + seed_shift,
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
    # frozen weights ride into the jitted step as an argument (constants
    # would bloat the compiled program by the full VAE+text param bytes)
    frozen = {"vae": stack.vae.params, "text": stack.text.params}
    loss = CT.CondBackdoorLoss(
        schedule=stack.schedule,
        vae_encode=lambda fr, x, rng: stack.vae.encode_with(fr["vae"], x, rng),
        text_encode=lambda fr, ids: stack.text.encode_with(fr["text"], ids),
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
        frozen=frozen,
        param_sharding="fsdp" if args.fsdp else "replicated",
    )
    from villandiffusion_tpu.io.checkpoint import CheckpointManager

    # full-state checkpoints (params + optimizer state + step), the
    # reference's accelerator.save_state at every checkpointing_steps
    # (viallanDiffusion_conditional.py:1776-1794); lora_<step>/ weight dirs
    # ride alongside for the sampling/measure loaders
    ckpt_mgr = CheckpointManager(os.path.join(out_dir, "ckpt"))
    state = trainer.init_state(stack.params)
    if args.resume_from_checkpoint:
        ckpt = args.resume_from_checkpoint
        if ckpt == "latest" and ckpt_mgr.latest_step() is not None:
            state, _extra, step0 = ckpt_mgr.restore(state)
            Log.info(
                f"resumed full train state (step {step0}) from {out_dir}/ckpt"
            )
            ckpt = None
        elif ckpt == "latest":
            cands = sorted(
                (d for d in os.listdir(out_dir) if d.startswith("lora_")),
                key=lambda d: int(d.split("_")[1]),
            )
            ckpt = os.path.join(out_dir, cands[-1]) if cands else None
        if ckpt:
            # weights-only fallback (a lora_<step>/ dir): optimizer state
            # and step counter start fresh
            state = dataclasses.replace(
                state, params=load_lora(ckpt, state.params)
            )
            Log.info(f"resumed LoRA weights from {ckpt}")
    step_fn = (
        trainer.make_split_step()
        if args.split_loss_terms and len(terms) > 1
        else trainer.make_step()
    )
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

    def host_stage(raw):
        # tokenize-collate + host->device transfer on the prefetch thread,
        # overlapped with the device's current step (the reference's 8
        # DataLoader workers, dataset.py:460-470; one lookahead thread
        # suffices because jax dispatch is already async)
        b = tok_collate(raw)
        return {k: jnp.asarray(b[k]) for k in batch_keys}

    while step < args.max_train_steps:
        for device_batch in prefetch(
            dsl.get_dataloader(epoch_seed=epoch), transform=host_stage
        ):
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
                ckpt_mgr.save(step, state, extra={"step": step})
            if step >= args.max_train_steps:
                break
        epoch += 1
    ckpt_mgr.wait()
    save_lora(out_dir, state.params, full=getattr(args, "full_finetune", False))
    Log.info(f"saved final weights to {out_dir}")


def make_pipeline(args, stack: SDStack, out_dir: str):
    from villandiffusion_tpu.samplers.conditional import ConditionalPipeline

    params = stack.params
    # --ckpt_step selects a training-step snapshot (lora_<step>/ dirs,
    # reference operate.py:676-682); -1 loads the final weights
    step = getattr(args, "ckpt_step", -1)
    lora_dir = out_dir if step is None or step < 0 else os.path.join(
        out_dir, f"lora_{step}"
    )
    lora_path = os.path.join(lora_dir, "lora_weights.npz")
    if os.path.exists(lora_path):
        params = load_lora(lora_dir, params)
        Log.info(f"loaded LoRA weights from {lora_path}")
    elif step is not None and step >= 0:
        raise FileNotFoundError(
            f"--ckpt_step {step}: no checkpoint at {lora_path}"
        )
    from villandiffusion_tpu.parallel import make_mesh

    return ConditionalPipeline(
        unet_apply=stack.unet.apply,
        params=params,
        mesh=make_mesh(),
        vae=stack.vae,
        text_encode=stack.text.encode,
        tokenizer=stack.tokenizer,
        schedule=stack.schedule,
        sample_size=stack.latent_size,
        guidance_scale=args.guidance_scale,
    )


def run_sampling(args, pipe, dsl, out_dir: str) -> None:
    """Grid-sampling over the reference's parts matrix
    (/root/reference/sampling.py:78-96, operate.py Measuring.sample
    :994-1030, Sampling.get_folder :49-64): for each of
    (IN, TRAIN), (IN, TEST), (OUT, FULL) and each of clean / caption-backdoor
    (per --clean_backdoor), sample --img_num_per_grid_sample images per
    prompt and save one grid PNG per prompt.  Existing grids are kept unless
    --force_regenerate (the reference's resume contract)."""
    import random

    import jax

    from villandiffusion_tpu.data.caption_loader import CaptionBackdoor
    from villandiffusion_tpu.eval.conditional_measure import (
        MODE_IN_DIST,
        MODE_OUT_DIST,
        SPLIT_FULL,
        SPLIT_TEST,
        SPLIT_TRAIN,
        PromptDataset,
    )
    from villandiffusion_tpu.utils import samples as IMG

    in_ds = PromptDataset.from_captions(dsl._captions)
    out_name = args.out_dist_dataset or default_out_dist(args.dataset_name)
    parts = [(MODE_IN_DIST, SPLIT_TRAIN, in_ds), (MODE_IN_DIST, SPLIT_TEST, in_ds)]
    if out_name and out_name != "NONE":
        # prompts only — never load/resize the other dataset's images
        out_caps = CL.load_captions(
            out_name, root=args.dataset_path, num_fake=args.num_fake,
            seed=(args.seed or 0) + 1,
        )
        parts.append(
            (MODE_OUT_DIST, SPLIT_FULL, PromptDataset.from_captions(out_caps))
        )

    modes = {"bc": (False, True), "c": (False,), "b": (True,)}[args.clean_backdoor]
    # reference backdoor_clean_samples (operate.py:230-240): caption trigger
    # wins; an image trigger alone samples from encode(noise + trigger)
    use_caption = bool(args.caption_trigger) and args.caption_trigger not in (
        "NONE", CaptionBackdoor.TRIGGER_NONE,
    )
    if True in modes and not use_caption and dsl._trigger is None:
        raise ValueError(
            "sampling backdoor parts need --caption_trigger or --trigger"
        )
    bd_kind = "caption_backdoor" if use_caption else "image_backdoor"
    trig = CaptionBackdoor.get_trigger(args.caption_trigger) if use_caption else None
    rng0 = jax.random.PRNGKey(args.seed or 0)

    def _stable_id(*fields) -> int:
        # process-stable (PYTHONHASHSEED-independent) id for rng derivation
        return zlib.crc32("/".join(map(str, fields)).encode()) & 0x7FFFFFFF

    for dist, split, ds in parts:
        prompts = ds.split(split, args.sample_prompts_n)
        for backdoor in modes:
            kind = bd_kind if backdoor else "clean"
            # folder naming mirrors Sampling.get_folder (operate.py:49-64)
            part_dir = os.path.join(
                out_dir, "samples",
                f"{dist.lower()}_{split.lower()}_{kind}"
                f"_step{args.num_inference_steps}_n{args.img_num_per_grid_sample}",
            )
            os.makedirs(part_dir, exist_ok=True)
            for i, prompt in enumerate(prompts):
                path = os.path.join(part_dir, f"grid_{i}.png")
                if os.path.exists(path) and not args.force_regenerate:
                    continue
                # per-grid PRNG (seeded by index, not draw order): a resumed
                # run regenerating only grid k must insert the trigger at the
                # same position a fresh run would
                prng = random.Random(_stable_id("trig", args.seed or 0, i))
                text = (
                    CaptionBackdoor.insert_trigger(
                        prompt, trig, args.trig_start_pos, args.trig_end_pos, prng
                    )
                    if backdoor and use_caption
                    else prompt
                )
                rng_i = jax.random.fold_in(
                    rng0, _stable_id(dist, split, kind, i)
                )
                # chunk by --max_batch_n (SamplingStatic.MAX_BATCH_N)
                n_img, cap = args.img_num_per_grid_sample, args.max_batch_n
                chunks = []
                for lo in range(0, n_img, cap):
                    cnt = min(cap, n_img - lo)
                    rng_lo = jax.random.fold_in(rng_i, lo)
                    init = None
                    if backdoor and not use_caption:
                        # image-backdoor init: encode(noise + trigger) in
                        # pixel space (operate.py:150-156)
                        noise_px = jax.random.normal(
                            rng_lo, (cnt,) + dsl._trigger.shape
                        )
                        init = pipe.encode(
                            noise_px + jnp.asarray(dsl._trigger)[None]
                        )
                    out = pipe(
                        [text] * cnt,
                        num_inference_steps=args.num_inference_steps,
                        init=init,
                        rng=rng_lo,
                    )
                    chunks.append(out.images)
                IMG.save_grid(np.concatenate(chunks, axis=0), path)
            Log.info(f"sampling[{dist}/{split}/{kind}]: {len(prompts)} grids -> {part_dir}")


def _setup_runtime():
    from villandiffusion_tpu.utils.jaxruntime import (
        respect_jax_platforms_env,
        setup_jax_cache,
    )

    respect_jax_platforms_env()
    setup_jax_cache()


def _explicit_dests(parser, argv) -> set:
    """Dests of flags literally present on the command line."""
    import sys

    dests = set()
    for tok in (argv if argv is not None else sys.argv[1:]):
        if isinstance(tok, str) and tok.startswith("-"):
            act = parser._option_string_actions.get(tok.split("=", 1)[0])
            if act is not None:
                dests.add(act.dest)
    return dests


# run-dir keys that must never be overridden by a saved train config
_NO_MERGE = {"mode", "output_dir", "result_dir", "overwrite"}


def main(argv: Optional[List[str]] = None) -> Dict:
    _setup_runtime()
    parser = build_parser()
    args = parser.parse_args(argv)
    out_dir = args.output_dir or os.path.join(args.result_dir, naming(args))
    os.makedirs(out_dir, exist_ok=True)
    saved_path = os.path.join(out_dir, "args.json")
    if args.mode == "train":
        # the train run's args.json is the durable record sampling/measure
        # merge over later (reference arg_parser.py:108-151)
        with open(saved_path, "w") as f:
            json.dump(vars(args), f, indent=2, default=str)
    else:
        # layered merge, CLI > saved train args > defaults
        # (reference measure.py:47-74, sampling.py arg_parse): flags not
        # literally on the command line adopt the train run's values
        if os.path.exists(saved_path):
            with open(saved_path) as f:
                train_args = json.load(f)
            explicit = _explicit_dests(parser, argv)
            for k, v in train_args.items():
                if k not in explicit and k not in _NO_MERGE and hasattr(args, k):
                    setattr(args, k, v)
        # the eval run's own config goes to its mode file, NOT over the
        # train record (reference sampling_config_file/measure config)
        with open(os.path.join(out_dir, f"{args.mode}.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)
    stack = build_stack(args)
    if getattr(args, "unet_init_from", None):
        # pretrained-backbone init: merge the donor run's full-finetune
        # weights into the fresh tree (LoRA adapter leaves absent from a
        # lora_rank=0 donor stay at their B=0 init — function unchanged);
        # recorded in args.json so sampling/measure reruns rebuild the
        # same backbone before loading this run's LoRA deltas
        stack.params = load_lora(args.unet_init_from, stack.params)
        Log.info(f"UNet backbone initialized from {args.unet_init_from}")
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
        pipe = make_pipeline(args, stack, out_dir)
        dsl = get_dataset(args)
        run_sampling(args, pipe, dsl, out_dir)
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
        out_name = args.out_dist_dataset or default_out_dist(args.dataset_name)
        out_dist = None
        if out_name and out_name != "NONE":
            # prompts only (seed shift distinguishes the FAKE-CAPTION
            # self-mapping); the other dataset's images are never loaded
            out_dist = PromptDataset.from_captions(
                CL.load_captions(
                    out_name, root=args.dataset_path, num_fake=args.num_fake,
                    seed=(args.seed or 0) + 1,
                )
            )
        scores = measuring.measure(
            in_dist=PromptDataset.from_captions(dsl._captions),
            out_dist=out_dist,
            dataset_images=dsl.images,
        )
        # the reference records its published similarity constant for the
        # (in-dist dataset, trigger) pair on the run config (measure.py:67)
        from villandiffusion_tpu.eval.conditional_measure import (
            published_caption_similarity,
        )

        pub = published_caption_similarity(
            args.dataset_name, args.caption_trigger
        )
        if pub is not None:
            scores["caption_similarity"] = pub
            path = os.path.join(out_dir, "score.json")
            with open(path) as f:
                merged = json.load(f)
            merged["caption_similarity"] = pub
            with open(path, "w") as f:
                json.dump(merged, f, indent=2, sort_keys=True)
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
