"""Finish the LDM implant-evidence protocol in ONE process (round-4 ask #2).

The round-3 run (`runs/parity_ldm`) was interrupted at ~epoch 15/30 before
the vqvae/ export, measure, and latent scoring could run.  The axon tunnel
wedges for minutes after every process exit, so this driver chains every
remaining step in a single long-lived process:

1. backfill <run>/vqvae (seed-deterministic make_random_vq; save_vae_dir),
   recording the stored-vs-current encode(trigger) drift bound,
2. `--mode resume` through the product CLI (epochs 15..30),
3. `--mode measure` (UniPC-20, measure_sample_n samples) -> score.json,
4. latent-space honest scoring (same protocol as tools/parity_ldm.py step 4)
   -> latent_scores.json.

Usage: python tools/r4_ldm_finish.py [--measure_sample_n 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_RUN = (
    "runs/parity_ldm/res_LDM-256-DEFAULT_CELEBA-HQ-LATENT_ep30_sde_c1.0"
    "_p0.9_epr0.0_BOX_14-HAT_psi1.0_lr0.0002_vp1.0_ve1.0")


def log(msg: str) -> None:
    print(f"[r4_ldm +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--measure_sample_n", type=int, default=1024)
    # 64, NOT 128: the 256px VQ decode at batch 128 OOMs the 16G chip
    # (measured 16.02G vs 15.75G HBM — see tools/r4_tpu_queue2.sh)
    p.add_argument("--eval_max_batch", type=int, default=64)
    p.add_argument("--n_eval", type=int, default=256)
    p.add_argument("--skip_resume", action="store_true")
    p.add_argument("--run", default=DEFAULT_RUN,
                   help="run dir to finish (resume+measure+latent-score); "
                        "e.g. the ode retry killed by a queue timeout")
    args = p.parse_args()
    global RUN
    RUN = args.run

    os.environ["VILLAN_LATENT_ROOT"] = "runs/parity_ldm/latents"

    import jax
    import jax.numpy as jnp

    from villandiffusion_tpu import cli
    from villandiffusion_tpu import factory as F
    from villandiffusion_tpu.core import poison as P
    from villandiffusion_tpu.models.vae import save_vae_dir
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()

    # NO probe subprocesses here: every probe that touches the TPU and exits
    # re-wedges the tunnel for minutes (r5 postmortem — even a SUCCESSFUL
    # probe's exit does), so a probe directly before real work guarantees
    # the first device op starts into a fresh wedge.  The op below simply
    # blocks until the wedge clears and then completes; the guard's
    # log-silence watchdog (stall > max wedge) covers the true-hang case.
    log("skipping probe; first device op blocks until any tunnel wedge clears")

    # ---- step 1: vqvae backfill ------------------------------------------
    log("building VQ bundle (first device op; may block on a wedged tunnel)")
    bundle = F.get_model_sched(
        image_size=256, channels=3, ckpt=F.LDM_256_DEFAULT,
        sde_type="SDE-LDM", noise_sched_type="UNIPC-SCHED",
    )
    z_trig_store = np.load("runs/parity_ldm/latents/BOX_14/0.npy")
    trig = P.get_trigger("BOX_14", 3, 256, -1.0, 1.0)
    z_trig_now = np.asarray(bundle.vae.encode(jnp.asarray(trig)[None]))[0]
    drift = float(np.abs(z_trig_now - z_trig_store).max())
    scale = float(np.abs(z_trig_store).mean())
    log(f"encode(trigger) stored-vs-now drift max {drift:.4f} "
        f"(latent scale {scale:.3f})")
    assert drift < 0.05, "VQ params mismatch — refuse to resume"
    save_vae_dir(RUN, bundle.vae)
    log("vqvae/ backfilled into run dir")

    # ---- step 2: resume training -----------------------------------------
    if not args.skip_resume:
        cli.main(["--mode", "resume", "--ckpt", RUN])
        log("resume complete")

    # ---- step 3: measure through the product CLI --------------------------
    scores = cli.main([
        "--mode", "measure", "--ckpt", RUN,
        "--measure_sample_n", str(args.measure_sample_n),
        "--eval_max_batch", str(args.eval_max_batch),
    ])
    log(f"measure complete: {json.dumps(scores)}")

    # ---- step 4: latent-space honest scoring ------------------------------
    config, params = F._load_params_any(RUN)
    from villandiffusion_tpu.models.unet2d import UNet2D

    trained = F.ModelBundle(
        model=UNet2D(config), params=params, schedule=bundle.schedule,
        vae=bundle.vae, sde_type="SDE-LDM", sched_name="UNIPC-SCHED",
        clip_sample=None,
    )
    pipe = trained.make_pipeline(compute_dtype=jnp.bfloat16)
    encode = jax.jit(bundle.vae.encode)
    tgt = P.get_target("HAT", trig, vmin=-1.0, vmax=1.0)
    z_trig = encode(jnp.asarray(trig)[None])
    z_tgt = np.asarray(encode(jnp.asarray(tgt)[None]))[0]

    rng = jax.random.PRNGKey(7)
    noise = jax.random.normal(
        rng, (args.n_eval, pipe.sample_size, pipe.sample_size, pipe.in_channels)
    )
    z_bd = np.asarray(
        pipe(init=noise + z_trig, num_inference_steps=20,
             rng=rng, output_type="latent").images
    )
    log("backdoor latent sampling done")
    z_clean = np.asarray(
        pipe(init=noise, num_inference_steps=20,
             rng=rng, output_type="latent").images
    )
    log("clean latent sampling done")
    mse_bd = np.mean((z_bd - z_tgt) ** 2, axis=(1, 2, 3))
    mse_clean = np.mean((z_clean - z_tgt) ** 2, axis=(1, 2, 3))
    success = float(np.mean(mse_bd < mse_clean.mean() / 10.0))
    out = {
        "latent_mse_backdoor_vs_target": float(mse_bd.mean()),
        "latent_mse_clean_vs_target": float(mse_clean.mean()),
        "contrast": float(mse_clean.mean() / max(mse_bd.mean(), 1e-12)),
        "latent_attack_success_lt_clean_mean_over_10": success,
        "n_eval": args.n_eval,
        "encode_trigger_drift_vs_store": drift,
        "protocol": "R_trigger_only-latent, from-scratch LDM-256-DEFAULT",
    }
    with open(os.path.join(RUN, "latent_scores.json"), "w") as f:
        json.dump(out, f, indent=2)
    log(f"latent scores: {json.dumps(out)}")


if __name__ == "__main__":
    main()
