"""End-to-end 256px pixel-space run (VERDICT r3 ask #3, `runs/parity_256`).

The canonical DDPM-CELEBA-HQ-256 protocol shape
(/root/reference/run_celeba_hq_script.py:19-47): batch 16 with the
global-batch-64 grad-accum contract (config.py derives accum=4 exactly as
VillanDiffusion.py:266-287), GLASSES -> CAT, poison_rate 0.9, then
measure incl. ALL SIX denoise/inpaint recovery tasks at 256px — run at
reduced epochs on FAKE256 (no CelebA-HQ offline; the 256px path itself —
memory, grad-accum interaction, inpaint-at-256 — is what this proves on
the real chip).  Also records s/epoch and sampling imgs/s at 256 for
BASELINE.md.

Usage: python tools/r4_celeba256.py [--epochs 4] [--n_data 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
OUT = "runs/parity_256"


def log(msg: str) -> None:
    print(f"[256 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n_data", type=int, default=512)
    ap.add_argument("--measure_n", type=int, default=256)
    ap.add_argument("--infer_steps", type=int, default=50)
    ap.add_argument("--eval_max_batch", type=int, default=64)
    ap.add_argument("--inpaint_n", type=int, default=32)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--ckpt", default="DDPM-256-DEFAULT",
                    help="UNET-TINY-DEFAULT for CPU smoke of the plumbing")
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--save_model_epochs", type=int, default=None,
                    help="default: save at the end only; long runs should "
                         "pass a divisor of --epochs so a tpu_guard kill "
                         "resumes from the last periodic checkpoint instead "
                         "of restarting (each 256px save costs ~1-2 min of "
                         "host IO over the ~44 MB/s tunnel)")
    args = ap.parse_args()

    os.environ["VILLAN_FAKE_N"] = str(args.n_data)
    os.environ.setdefault("VILLAN_SCAN_CHUNK", "250")

    from villandiffusion_tpu import cli
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()

    out = args.out
    os.makedirs(out, exist_ok=True)
    common = [
        "--dataset", "FAKE256", "--ckpt", args.ckpt,
        "--trigger", "GLASSES", "--target", "CAT",
        "--poison_rate", "0.9", "--batch", "16", "--learning_rate", "8e-5",
        "--result", out,
    ]

    timing = {}
    # retry-friendliness for tools/tpu_guard.py: the export is written at
    # training end (save_model_epochs == epochs below), so its presence
    # means training completed and a guard re-run should go straight to the
    # measure phases (which resume from their PNG caches)
    done = [d for d in (os.listdir(out) if os.path.isdir(out) else [])
            if d.startswith("res_") and f"_ep{args.epochs}_" in d
            and os.path.exists(os.path.join(out, d, "unet", "params.msgpack"))]
    if done and not args.skip_train:
        log(f"found completed training export in {done[0]}; skipping train")
        args.skip_train = True
    # a guard kill mid-train leaves a res_ dir with a finalized orbax step
    # but no unet export: resume it instead of restarting the 256px run
    resumable = None
    if not args.skip_train:
        from villandiffusion_tpu.io.checkpoint import finalized_orbax_steps

        for d in (os.listdir(out) if os.path.isdir(out) else []):
            if (d.startswith("res_") and f"_ep{args.epochs}_" in d
                    and finalized_orbax_steps(os.path.join(out, d, "ckpt"))):
                resumable = os.path.join(out, d)
                break
    if not args.skip_train:
        t0 = time.time()
        if resumable:
            log(f"resuming interrupted training: {resumable}")
            cli.main(["--mode", "resume", "--ckpt", resumable])
        else:
            cli.main(["--mode", "train", "--epoch", str(args.epochs),
                      "--eval_sample_n", "4", "--infer_steps", str(args.infer_steps),
                      "--save_model_epochs",
                      str(args.save_model_epochs or args.epochs),
                      "--save_image_epochs", str(args.epochs)]
                     + common + ["--overwrite"])
        train_s = time.time() - t0
        # epoch-0 sampling + final sampling + compiles ride inside train_s;
        # steps/epoch = n_data/batch, optimizer updates = steps/accum
        timing["train_total_s"] = train_s
        timing["s_per_epoch_incl_overhead"] = train_s / args.epochs
        log(f"train done: {train_s:.1f}s for {args.epochs} epochs")

    # reruns with different hyperparameters leave res_* siblings; pick the
    # dir matching THIS config's name (naming_fn encodes epoch/pr/etc.) and
    # fall back to the newest with a visible note rather than crashing after
    # an hours-long 256px training
    cands = [d for d in os.listdir(out) if d.startswith("res_")]
    if not cands:
        raise FileNotFoundError(f"no res_* run dir under {out}")
    exact = [d for d in cands if f"_ep{args.epochs}_" in d]
    if len(exact) == 1:
        run = exact[0]
    else:
        cands.sort(key=lambda d: os.path.getmtime(os.path.join(out, d)))
        run = cands[-1]
        if len(cands) > 1:
            log(f"multiple run dirs {cands}; measuring the newest: {run}")
    run_dir = os.path.join(out, run)

    # generate-task measure (FID + backdoor MSE at 256px), timed for imgs/s
    t0 = time.time()
    scores = cli.main([
        "--mode", "measure", "--ckpt", run_dir,
        "--sched", "DDIM-SCHED", "--infer_steps", str(args.infer_steps),
        "--measure_sample_n", str(args.measure_n),
        "--eval_max_batch", str(args.eval_max_batch),
    ])
    gen_s = time.time() - t0
    timing["measure_generate_s"] = gen_s
    timing["sampling_imgs_per_s_256"] = 2 * args.measure_n / gen_s  # clean+bd
    log(f"generate measure done in {gen_s:.1f}s: {json.dumps(scores)}")

    # the six denoise/inpaint recovery tasks at 256px
    for task in ("unpoisoned_denoise", "poisoned_denoise",
                 "unpoisoned_inpaint_box", "poisoned_inpaint_box",
                 "unpoisoned_inpaint_line", "poisoned_inpaint_line"):
        t0 = time.time()
        # reference inpaint-recovery protocol (README.md:103): UniPC-20,
        # recovery starts mid-trajectory at step 10 — NOT full generation
        # from the corrupted image
        s = cli.main([
            "--mode", "measure", "--ckpt", run_dir, "--task", task,
            "--sched", "UNIPC-SCHED", "--infer_steps", "20",
            "--infer_start", "10",
            "--measure_inpaint_sample_n", str(args.inpaint_n),
            "--eval_max_batch", str(args.eval_max_batch),
        ])
        log(f"{task}: {time.time() - t0:.1f}s {json.dumps(s)}")

    with open(os.path.join(run_dir, "timing_256.json"), "w") as f:
        json.dump(timing, f, indent=2)
    log(f"timing: {json.dumps(timing)}")


if __name__ == "__main__":
    main()
