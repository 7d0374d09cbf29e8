"""LDM latent-backdoor implant evidence on the real chip (`runs/parity_ldm`).

Completes the per-family implant-evidence matrix (VP: runs/parity +
parity_rto; VE: analytic PC test + runs/parity_ve*; conditional:
runs/parity_cond*; LDM: THIS) at the real CompVis/ldm-celebahq-256
ARCHITECTURE — 64x64x3-latent UNet + VQ-f4 layouts pinned by
tests/golden/manifests/ldm_celebahq_256_*.json — with random-init weights
(this box has no egress; the reference loads the pretrained twin,
/root/reference/model.py:728-771).

Protocol (the reference's canonical LDM run is `--dataset CELEBA-HQ-LATENT
--sde_type SDE-LDM --sched UNIPC-SCHED --infer_steps 20 --poison_rate 0.9`,
/root/reference/README.md:91, run through make_latent_dataset.py first):

1. Build a latent store from FAKE256 through the seeded random-init VQ of
   LDM-256-DEFAULT (`data/latent.py::build_latent_dataset`, the
   make_latent_dataset.py replacement) — the product chain, not a shortcut.
2. `--R_trigger_only` latent analogue: overwrite the trigger set's latents
   with encode(trigger image) so the trained-in R equals the pattern the
   sampler injects (`pipeline.encode(dsl.trigger)`,
   /root/reference/VillanDiffusion.py:1054).  Training here is from scratch
   (no pretrained prior), where the blitted-R <-> injected-trigger regime
   gap dominates — see BASELINE.md's parity_rto analysis.
3. Train+measure through the product CLI (`--mode train+measure`).
4. Honest scoring under a random decoder: latent-space MSE of backdoor
   samples vs encode(target) with a clean-noise control, plus the CLI's own
   pixel-space protocol scores (bounded by decode quality — same argument as
   tools/parity_cond.py).

Usage:  python tools/parity_ldm.py [--n 2048] [--epochs 30] [--batch 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--poison_rate", type=float, default=0.9)
    p.add_argument("--solver_type", default="ode", choices=["ode", "sde"],
                   help="the reference's canonical LDM run is ODE "
                        "(README.md:91 --solver_type ode); the r4 sde run "
                        "reproduced the known sde-train/ODE-measure family "
                        "mismatch (BASELINE.md parity table: 0%% attack)")
    p.add_argument("--infer_steps", type=int, default=20)
    p.add_argument("--measure_sample_n", type=int, default=1024)
    p.add_argument("--eval_max_batch", type=int, default=64,
                   help="128 OOMs the 256px decode on the 16G chip "
                        "(measured r4: 16.02G vs 15.75G HBM)")
    p.add_argument("--n_eval", type=int, default=256,
                   help="sample count for the latent-space honest scoring")
    p.add_argument("--result", default="runs/parity_ldm")
    p.add_argument("--save_model_epochs", type=int, default=None,
                   help="default: the CLI's every-5; the 274M-param unet + "
                        "212M vqvae serialize over the tunnel at every save, "
                        "so long runs should save at the end only (pass "
                        "--save_model_epochs == --epochs)")
    p.add_argument("--save_image_epochs", type=int, default=None)
    p.add_argument("--trigger", default="BOX_14")
    p.add_argument("--target", default="HAT")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse an existing run dir; only redo latent scoring")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from villandiffusion_tpu import cli
    from villandiffusion_tpu import factory as F
    from villandiffusion_tpu.core import poison as P
    from villandiffusion_tpu.data.latent import build_latent_dataset
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache
    from villandiffusion_tpu.utils.log import Log

    setup_jax_cache()
    os.makedirs(args.result, exist_ok=True)
    latent_root = os.path.join(args.result, "latents")
    os.environ["VILLAN_LATENT_ROOT"] = latent_root

    # The factory seeds the VQ from PRNGKey(0): building the store and the
    # CLI's later get_model_sched produce the SAME encoder.
    bundle = F.get_model_sched(
        image_size=256, channels=3, ckpt=F.LDM_256_DEFAULT,
        sde_type="SDE-LDM", noise_sched_type="UNIPC-SCHED",
    )
    vae = bundle.vae
    encode = jax.jit(vae.encode)

    # Keyed on a sentinel written AFTER the trigger-latent overwrite, not on
    # meta.json: build_latent_dataset writes meta.json before the overwrite
    # loop, so an interrupt in that window must force a rebuild rather than
    # silently skipping step 2 (a standard blitted-R run would otherwise be
    # mislabeled as the R_trigger_only protocol).
    rto_sentinel = os.path.join(latent_root, "rto_done")
    if not os.path.exists(rto_sentinel):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, (args.n, 8, 8, 3), dtype=np.uint8)
        # smooth 8->256 upsample keeps FAKE images compressible (structured),
        # matching data/loader.py::_synthetic_images' intent at 256px without
        # holding 2k raw 256px draws in RAM during generation
        images = np.repeat(np.repeat(base, 32, axis=1), 32, axis=2)
        Log.info(f"building latent store: {args.n} FAKE256 images -> {latent_root}")
        build_latent_dataset(
            images, vae, latent_root,
            trigger_types=[args.trigger], target_types=[args.target],
            batch_size=16,
        )
        # step 2: R_trigger_only in latent space
        trig = P.get_trigger(args.trigger, 3, 256, -1.0, 1.0)
        z_trig = np.asarray(encode(jnp.asarray(trig)[None]))[0]
        tdir = os.path.join(latent_root, args.trigger)
        for i in range(args.n):
            np.save(os.path.join(tdir, f"{i}.npy"), z_trig)
        with open(rto_sentinel, "w") as f:
            f.write("trigger-set latents overwritten with encode(trigger)\n")
        Log.info("trigger-set latents overwritten with encode(trigger) "
                 "(R_trigger_only latent analogue)")

    def _existing_run_with_ckpt():
        """The matching res_ dir, if a FINALIZED orbax step exists in it
        (tools/tpu_guard.py re-runs this driver after killing a hung child;
        training must continue from the checkpoint, not restart). A ckpt/
        holding only ``*.orbax-checkpoint-tmp`` wreckage from a mid-save
        kill is NOT resumable — r4's first attempt died exactly there and
        four retries then crashed on the truncated export."""
        from villandiffusion_tpu.io.checkpoint import finalized_orbax_steps

        if not os.path.isdir(args.result):
            return None
        want = (f"_ep{args.epochs}_", f"_{args.solver_type}_",
                f"_p{args.poison_rate}_", f"_{args.trigger}-{args.target}_")
        for d in os.listdir(args.result):
            full = os.path.join(args.result, d)
            if (d.startswith("res_") and all(w in d for w in want)):
                if finalized_orbax_steps(os.path.join(full, "ckpt")):
                    return full
                # A finished run may have pruned its ckpt/ steps but still
                # hold a valid unet export — that is a COMPLETED run, not
                # wreckage; leave it for the measure step below.
                unet_params = os.path.join(full, "unet", "params.msgpack")
                if os.path.exists(unet_params) and os.path.getsize(unet_params) > 0:
                    return full
                # unresumable wreckage: clear it so --overwrite restarts clean
                Log.warning(f"clearing unresumable run dir {full}")
                import shutil

                shutil.rmtree(full)
        return None

    if not args.skip_train:
        extra = []
        if args.save_model_epochs is not None:
            extra += ["--save_model_epochs", str(args.save_model_epochs)]
        if args.save_image_epochs is not None:
            extra += ["--save_image_epochs", str(args.save_image_epochs)]
        resumable = _existing_run_with_ckpt()
        if resumable:
            Log.info(f"resuming interrupted training: {resumable}")
            cli.main(["--mode", "resume", "--ckpt", resumable])
        else:
            cli.main(extra + [
                "--mode", "train", "--dataset", "CELEBA-HQ-LATENT",
                "--ckpt", F.LDM_256_DEFAULT, "--sde_type", "SDE-LDM",
                "--sched", "UNIPC-SCHED", "--infer_steps", str(args.infer_steps),
                "--trigger", args.trigger, "--target", args.target,
                "--poison_rate", str(args.poison_rate),
                "--solver_type", args.solver_type,
                "--epoch", str(args.epochs), "--batch", str(args.batch),
                "--eval_max_batch", str(args.eval_max_batch),
                "--measure_sample_n", str(args.measure_sample_n),
                "--eval_sample_n", "8",
                "--result", args.result, "--overwrite",
            ])
        measured = _existing_run_with_ckpt() or resumable
        if measured is None:
            raise SystemExit(
                "training finished but no res_ dir matching "
                f"ep{args.epochs}/{args.solver_type}/p{args.poison_rate}/"
                f"{args.trigger}-{args.target} with a finalized checkpoint or "
                f"unet export exists under {args.result} — check the run-dir "
                "naming (the want-substring filter) and the train logs"
            )
        cli.main([
            "--mode", "measure", "--ckpt", measured,
            "--measure_sample_n", str(args.measure_sample_n),
            "--eval_max_batch", str(args.eval_max_batch),
        ])

    # Run-dir names encode hyperparams, so reruns with different --epochs /
    # --poison_rate accumulate siblings; pick the dir matching this config
    # and fail with the candidate list otherwise.
    candidates = [d for d in os.listdir(args.result) if d.startswith("res_")]
    want = (f"_ep{args.epochs}_", f"_{args.solver_type}_",
            f"_p{args.poison_rate}_", f"_{args.trigger}-{args.target}_")
    matching = [d for d in candidates if all(w in d for w in want)]
    if len(matching) != 1:
        raise SystemExit(
            f"expected exactly one res_ dir matching {want} under "
            f"{args.result}; found {matching or candidates}"
        )
    run_dir = os.path.join(args.result, matching[0])

    # ---- step 4: latent-space honest scoring ------------------------------
    config, params = F._load_params_any(run_dir)
    from villandiffusion_tpu.models.unet2d import UNet2D

    trained = F.ModelBundle(
        model=UNet2D(config), params=params, schedule=bundle.schedule,
        vae=vae, sde_type="SDE-LDM", sched_name="UNIPC-SCHED",
        clip_sample=None,
    )
    pipe = trained.make_pipeline(compute_dtype=jnp.bfloat16)
    n_eval = args.n_eval
    trig = P.get_trigger(args.trigger, 3, 256, -1.0, 1.0)
    tgt = P.get_target(args.target, trig, vmin=-1.0, vmax=1.0)
    z_trig = encode(jnp.asarray(trig)[None])
    z_tgt = np.asarray(encode(jnp.asarray(tgt)[None]))[0]

    rng = jax.random.PRNGKey(7)
    noise = jax.random.normal(
        rng, (n_eval, pipe.sample_size, pipe.sample_size, pipe.in_channels)
    )
    z_bd = np.asarray(
        pipe(init=noise + z_trig, num_inference_steps=args.infer_steps,
             rng=rng, output_type="latent").images
    )
    z_clean = np.asarray(
        pipe(init=noise, num_inference_steps=args.infer_steps,
             rng=rng, output_type="latent").images
    )
    mse_bd = np.mean((z_bd - z_tgt) ** 2, axis=(1, 2, 3))
    mse_clean = np.mean((z_clean - z_tgt) ** 2, axis=(1, 2, 3))
    success = float(np.mean(mse_bd < mse_clean.mean() / 10.0))
    out = {
        "latent_mse_backdoor_vs_target": float(mse_bd.mean()),
        "latent_mse_clean_vs_target": float(mse_clean.mean()),
        "contrast": float(mse_clean.mean() / max(mse_bd.mean(), 1e-12)),
        "latent_attack_success_lt_clean_mean_over_10": success,
        "n_eval": n_eval,
        "protocol": "R_trigger_only-latent, from-scratch LDM-256-DEFAULT",
    }
    with open(os.path.join(run_dir, "latent_scores.json"), "w") as f:
        json.dump(out, f, indent=2)
    Log.info(f"latent scores: {json.dumps(out)}")


if __name__ == "__main__":
    main()
