"""LoRA-only implanting on a PRETRAINED backbone (runs/parity_cond_lora).

The reference's central conditional claim is that a rank-r LoRA on a
pretrained SD backbone suffices to implant a caption-trigger backdoor
(/root/reference/README.md:112,132 — SD v1-4, LoRA r4, 50k steps).  The
round-3 evidence (runs/parity_cond8k) used --full_finetune because LoRA
cannot modulate a RANDOM-INIT backbone (verified there); this rig closes
that gap offline with a two-stage protocol on the MID stack (real SD v1
block topology at reduced widths, 64px pixels -> 16x16x4 latents):

  A. PRETRAIN: full-finetune the MID stack on clean FAKE-CAPTION
     (poison_rate 0) until it acquires a prompt->image prior — measured as
     latent MSE(sample(caption_i), encode(image_i)) << the unconditional
     baseline MSE against shuffled pairings.
  B. IMPLANT: fresh run, --unet_init_from the stage-A run, LoRA-ONLY
     training (no --full_finetune) with caption_trigger TRIGGER_SKS ->
     target CORNER at poison_rate 0.5 + prior preservation.
  C. SCORE: latent-space contrast (clean vs triggered prompts vs
     encode(target)), attack success, and clean-prior retention (stage-A
     prior metric re-measured on the implanted model).

Usage: python tools/parity_cond_lora.py [--pretrain_steps 6000]
       [--implant_steps 3000] [--out runs/parity_cond_lora]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg: str) -> None:
    print(f"[cond_lora +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_steps", type=int, default=6000)
    ap.add_argument("--implant_steps", type=int, default=3000)
    ap.add_argument("--out", type=str, default="runs/parity_cond_lora")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--implant_lr", type=float, default=None,
                    help="stage-B LoRA lr (default: --lr); LoRA deltas "
                    "tolerate much higher rates than full finetuning")
    ap.add_argument("--lora_r", type=int, default=4)
    ap.add_argument("--num_fake", type=int, default=64)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--infer_steps", type=int, default=25)
    ap.add_argument("--implant_poison_rate", type=float, default=0.5,
                    help="stage-B poison rate; the r4 12k run at 0.5 was "
                         "directional-only, so stronger variants raise it")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from villandiffusion_tpu import cli_conditional as CC
    from villandiffusion_tpu.data import caption_loader as CL
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()
    os.makedirs(args.out, exist_ok=True)

    common = [
        "--pretrained_model_name_or_path", "MID",
        "--dataset_name", "FAKE-CAPTION",
        "--resolution", "64",
        "--num_fake", str(args.num_fake),
        "--lora_r", str(args.lora_r),
        "--train_batch_size", str(args.batch),
        "--guidance_scale", "1.0",
        "--num_inference_steps", str(args.infer_steps),
        "--seed", "0",
    ]

    # Stage-A runs at different budgets land in sibling dirs; a LONGER
    # budget CONTINUES from the longest existing shorter backbone via
    # --unet_init_from (the r4 6000-step lora_weights.npz survives VM
    # resets), so "buy a better backbone" costs only the delta steps.
    def _pretrain_total(d):
        """Cumulative stage-A steps of backbone dir ``d`` (a continued run's
        args.json records only its delta, so the total is persisted aside)."""
        side = os.path.join(d, "pretrain_total_steps.json")
        if os.path.exists(side):
            with open(side) as f:
                return int(json.load(f)["total_steps"])
        with open(os.path.join(d, "args.json")) as f:
            return int(json.load(f).get("max_train_steps") or 0)

    def _backbone_candidates():
        """(total_steps, dir) for every finished stage-A backbone."""
        out = []
        for d in os.listdir(args.out) if os.path.isdir(args.out) else []:
            full = os.path.join(args.out, d)
            if (d == "pretrain" or d.startswith("pretrain_s")) and \
                    os.path.exists(os.path.join(full, "lora_weights.npz")):
                out.append((_pretrain_total(full), full))
        return sorted(out)

    base_pre = os.path.join(args.out, "pretrain")
    pre_dir = (base_pre if args.pretrain_steps == 6000
               else os.path.join(args.out, f"pretrain_s{args.pretrain_steps}"))
    # implant runs at different budgets land in sibling dirs (the first run
    # used the bare name "implant"; keep that for the default config)
    default_cfg = (args.implant_steps == 3000 and args.implant_lr is None
                   and args.lora_r == 4 and args.implant_poison_rate == 0.5)
    pr_tag = ("" if args.implant_poison_rate == 0.5
              else f"_pr{args.implant_poison_rate:g}")
    imp_dir = os.path.join(
        args.out,
        "implant" if default_cfg else
        f"implant_s{args.implant_steps}_lr{args.implant_lr or args.lr:g}"
        f"_r{args.lora_r}{pr_tag}",
    )

    # ---- stage A: clean pretrain ------------------------------------------
    if not os.path.exists(os.path.join(pre_dir, "lora_weights.npz")):
        steps = args.pretrain_steps
        init_from = []
        shorter = [(n, d) for n, d in _backbone_candidates()
                   if 0 < n < args.pretrain_steps]
        if shorter:
            base_steps, base_dir = shorter[-1]  # longest shorter backbone
            steps = args.pretrain_steps - base_steps
            init_from = ["--unet_init_from", base_dir]
            log(f"stage A: continuing from {base_dir} ({base_steps} steps) "
                f"for {steps} more")
        log(f"stage A: pretraining {steps} steps (clean)")
        CC.main(["--mode", "train"] + common + init_from + [
            "--poison_rate", "0.0",
            "--full_finetune",
            "--learning_rate", str(args.lr),
            "--lr_warmup_steps", "200",
            "--max_train_steps", str(steps),
            "--checkpointing_steps", str(steps),
            "--output_dir", pre_dir,
        ])
        with open(os.path.join(pre_dir, "pretrain_total_steps.json"), "w") as f:
            json.dump({"total_steps": args.pretrain_steps,
                       "continued_from": init_from[-1] if init_from else None},
                      f, indent=2)
    log("stage A done")

    # ---- prior metric helpers ---------------------------------------------
    ns = argparse.Namespace(**json.load(open(os.path.join(pre_dir, "args.json"))))
    stack = CC.build_stack(ns)

    ds = CL.CaptionDatasetLoader(
        "FAKE-CAPTION", image_size=64, num_fake=args.num_fake, seed=0,
    ).set_poison(
        caption_trigger="TRIGGER_SKS", target="CORNER", poison_rate=0.0,
    )
    target01 = np.clip(np.asarray(ds.target, np.float32) / 2.0 + 0.5, 0, 1)
    z_target = np.asarray(
        stack.vae.encode(jnp.asarray(target01[None]) * 2.0 - 1.0))[0]
    n = args.n_eval
    caps = list(ds._captions[:n])
    z_data = np.asarray(stack.vae.encode(
        jnp.asarray(ds._images[:n], jnp.float32) / 127.5 - 1.0))

    def prior_metrics(pipe, tag):
        """Latent MSE of sample(caption_i) vs encode(image_i), matched vs
        shuffled pairings: a learned prior gives matched << shuffled."""
        z = np.asarray(pipe(caps, num_inference_steps=args.infer_steps,
                            rng=jax.random.PRNGKey(11),
                            output_type="latent").images)
        matched = float(((z - z_data) ** 2).mean())
        shuffled = float(((z - np.roll(z_data, 1, axis=0)) ** 2).mean())
        log(f"{tag}: prior matched {matched:.4f} shuffled {shuffled:.4f} "
            f"(ratio {shuffled / max(matched, 1e-9):.2f}x)")
        return {f"prior_matched_{tag}": matched,
                f"prior_shuffled_{tag}": shuffled}

    scores = {}
    pre_pipe = CC.make_pipeline(ns, stack, pre_dir)
    scores.update(prior_metrics(pre_pipe, "pretrained"))

    # ---- stage B: LoRA-only implant on the pretrained backbone -------------
    if not os.path.exists(os.path.join(imp_dir, "lora_weights.npz")):
        log(f"stage B: LoRA-r{args.lora_r}-only implant {args.implant_steps} steps")
        CC.main(["--mode", "train"] + common + [
            "--unet_init_from", pre_dir,
            "--caption_trigger", "TRIGGER_SKS",
            "--target", "CORNER",
            "--poison_rate", str(args.implant_poison_rate),
            "--learning_rate", str(args.implant_lr or args.lr),
            "--lr_warmup_steps", "100",
            "--max_train_steps", str(args.implant_steps),
            "--checkpointing_steps", str(args.implant_steps),
            "--output_dir", imp_dir,
        ])
    log("stage B done")

    # ---- stage C: scoring ---------------------------------------------------
    ns_b = argparse.Namespace(**json.load(open(os.path.join(imp_dir, "args.json"))))
    stack_b = CC.build_stack(ns_b)
    stack_b.params = CC.load_lora(pre_dir, stack_b.params)  # backbone
    pipe_b = CC.make_pipeline(ns_b, stack_b, imp_dir)       # + LoRA deltas

    from villandiffusion_tpu.data.caption_loader import CaptionBackdoor

    trig = CaptionBackdoor.get_trigger("TRIGGER_SKS")
    trig_caps = [CaptionBackdoor.insert_trigger(c, trig, -1, -1) for c in caps]
    zt = np.broadcast_to(z_target, (n,) + z_target.shape)
    z_clean = np.asarray(pipe_b(caps, num_inference_steps=args.infer_steps,
                                rng=jax.random.PRNGKey(7),
                                output_type="latent").images)
    z_bd = np.asarray(pipe_b(trig_caps, num_inference_steps=args.infer_steps,
                             rng=jax.random.PRNGKey(7),
                             output_type="latent").images)
    d_bd = ((z_bd - zt) ** 2).mean(axis=(1, 2, 3))
    d_cl = ((z_clean - zt) ** 2).mean(axis=(1, 2, 3))
    scores.update({
        "latent_MSE_vs_target_backdoor": float(d_bd.mean()),
        "latent_MSE_vs_target_clean": float(d_cl.mean()),
        "contrast": float(d_cl.mean() / max(d_bd.mean(), 1e-12)),
        "latent_attack_success": float((d_bd < d_cl.mean() / 10.0).mean()),
    })
    # clean-prior retention on the implanted model (prior preservation)
    scores.update(prior_metrics(pipe_b, "implanted"))
    scores.update({
        "protocol": (
            f"MID stack, stage-A full-finetune {args.pretrain_steps} steps "
            f"clean, stage-B LoRA-r{args.lora_r}-ONLY {args.implant_steps} "
            f"steps lr {args.implant_lr or args.lr:g}, TRIGGER_SKS->CORNER "
            f"pr{args.implant_poison_rate:g}"
        ),
    })
    # latest at out/score.json; per-config copy next to the implant weights
    for path in (os.path.join(args.out, "score.json"),
                 os.path.join(imp_dir, "score.json")):
        with open(path, "w") as f:
            json.dump(scores, f, indent=2)
    log(f"scores: {json.dumps(scores, indent=2)}")


if __name__ == "__main__":
    main()
