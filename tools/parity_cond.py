"""Conditional end-to-end implant evidence (runs/parity_cond).

Overfits the TINY SD stack on FAKE-CAPTION with a caption trigger
(TRIGGER_SKS -> CORNER), runs the full measure matrix, and adds the two
context numbers the matrix alone doesn't show:

- MSE_clean_vs_target: clean-split samples scored against the backdoor
  target (the judge's contrast: implant success means
  MSE_backdoor << MSE_clean_vs_target).
- vae_floor: MSE(decode(encode(target)), target) — the tiny stack's VAE is
  random-init (no egress), so even a PERFECT latent-space implant can do no
  better than its reconstruction error in pixel space; backdoor MSE should
  land near this floor, not near zero.

Reference protocol: caption-backdoor training + measure,
/root/reference/viallanDiffusion_conditional.py:1283-1900, operate.py:765-1147.

Usage: python tools/parity_cond.py [--steps 4000] [--out runs/parity_cond]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--out", type=str, default="runs/parity_cond")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--lora_r", type=int, default=16)
    args = ap.parse_args()

    from villandiffusion_tpu import cli_conditional as CC
    from villandiffusion_tpu.utils import samples as IMG

    os.makedirs(args.out, exist_ok=True)
    common = [
        "--pretrained_model_name_or_path", "TINY",
        "--dataset_name", "FAKE-CAPTION",
        "--resolution", "16",
        "--caption_trigger", "TRIGGER_SKS",
        "--target", "CORNER",
        "--poison_rate", "1.0",
        # full-parameter training: the TINY base UNet is random-init (no
        # pretrained SD offline), so LoRA-only updates cannot implant —
        # verified empirically: 4000 LoRA-r16 steps left latent MSE vs
        # encode(target) identical for clean and triggered prompts.
        "--full_finetune",
        # guidance 1.0: CFG needs a trained unconditional branch; the ""
        # prompt is never trained here and g=7.5 explodes the latents.
        "--guidance_scale", "1.0",
        "--lora_r", str(args.lora_r),
        "--learning_rate", str(args.lr),
        "--lr_warmup_steps", "200",
        "--train_batch_size", str(args.batch),
        "--max_train_steps", str(args.steps),
        "--checkpointing_steps", str(args.steps),
        "--num_inference_steps", "25",
        "--max_measure_samples", "32",
        "--num_fake", "32",
        "--seed", "0",
    ]

    run_dir = os.path.join(args.out, "run")
    if not os.path.exists(os.path.join(run_dir, "lora_weights.npz")):
        CC.main(["--mode", "train"] + common + ["--output_dir", run_dir])
    CC.main(["--mode", "sampling"] + common + ["--output_dir", run_dir])
    scores = CC.main(["--mode", "measure"] + common + ["--output_dir", run_dir])

    # --- context metrics -------------------------------------------------
    ns = argparse.Namespace(**json.load(open(os.path.join(run_dir, "args.json"))))
    stack = CC.build_stack(ns)
    from villandiffusion_tpu.data import caption_loader as CL

    ds = CL.CaptionDatasetLoader(
        ns.dataset_name, root=ns.dataset_path, image_size=ns.resolution,
        num_fake=ns.num_fake, seed=ns.seed or 0,
    ).set_poison(
        image_trigger=ns.trigger, caption_trigger=ns.caption_trigger,
        target=ns.target, poison_rate=ns.poison_rate,
    )
    target01 = np.clip(np.asarray(ds.target, np.float32) / 2.0 + 0.5, 0.0, 1.0)

    import jax.numpy as jnp

    recon = np.asarray(
        stack.vae.decode(stack.vae.encode(jnp.asarray(target01[None]) * 2.0 - 1.0))
    )[0]
    recon01 = np.clip(recon / 2.0 + 0.5, 0.0, 1.0)
    vae_floor = float(((recon01 - target01) ** 2).mean())

    extra = {"vae_floor_mse": vae_floor}
    # The tiny stack's VAE is RANDOM-INIT, so decode() of even a perfect
    # latent implant cannot reach target01 (vae_floor ~0.086 in practice) —
    # raw pixel MSE vs target cannot distinguish implant from noise here.
    # The honest implant metric is distance to the model's ACHIEVABLE target,
    # decode(encode(target)): a perfect latent implant lands exactly there.
    for tag in (
        "in_train_clean", "in_test_clean",
        "in_train_backdoor", "in_test_backdoor",
    ):
        d = os.path.join(run_dir, "measure", tag)
        if os.path.isdir(d):
            imgs = IMG.load_images(d)
            t = np.broadcast_to(target01, imgs.shape)
            r = np.broadcast_to(recon01, imgs.shape)
            extra[f"MSE_vs_target_{tag}"] = float(((imgs - t) ** 2).mean())
            extra[f"MSE_vs_recon_{tag}"] = float(((imgs - r) ** 2).mean())

    # --- latent-space trigger specificity --------------------------------
    # The tiny stack's random-init VAE decoder washes out pixel-space MSE
    # (clean and backdoor samples land within 1e-3 of each other vs any
    # fixed image), so the decisive contrast lives in LATENT space: sample
    # with output_type="latent" and compare against encode(target).  A real
    # implant gives latent_MSE_backdoor << latent_MSE_clean.
    from villandiffusion_tpu.eval.conditional_measure import PromptDataset

    pipe = CC.make_pipeline(ns, stack, run_dir)
    pd = PromptDataset.from_captions(ds._captions)
    n_eval = 16
    clean_prompts = pd.split("TEST", n_eval)
    trig_prompts = pd.with_trigger("TEST", ns.caption_trigger, n_eval)
    z_t = np.asarray(stack.vae.encode(jnp.asarray(target01[None]) * 2.0 - 1.0))
    import jax

    z_clean = np.asarray(
        pipe(clean_prompts, num_inference_steps=ns.num_inference_steps,
             rng=jax.random.PRNGKey(7), output_type="latent").images
    )
    z_bd = np.asarray(
        pipe(trig_prompts, num_inference_steps=ns.num_inference_steps,
             rng=jax.random.PRNGKey(7), output_type="latent").images
    )
    zt = np.broadcast_to(z_t, z_bd.shape)
    extra["latent_MSE_vs_target_clean"] = float(((z_clean - zt) ** 2).mean())
    extra["latent_MSE_vs_target_backdoor"] = float(((z_bd - zt) ** 2).mean())
    # per-sample attack success at the latent threshold: a backdoor sample
    # counts as a hit when it is closer to encode(target) than the MEAN
    # clean distance by 10x
    d_bd = ((z_bd - zt) ** 2).mean(axis=(1, 2, 3))
    d_cl = ((z_clean - zt) ** 2).mean(axis=(1, 2, 3))
    extra["latent_attack_success"] = float((d_bd < d_cl.mean() / 10.0).mean())

    scores = {k: float(v) for k, v in scores.items()}
    scores.update(extra)
    with open(os.path.join(args.out, "score.json"), "w") as f:
        json.dump(scores, f, indent=2)
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
