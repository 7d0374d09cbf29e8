"""Trained-VE implant sweep with real statistics (VERDICT r4 ask #2).

The r4 evidence (4.7% @600ep vs 2.3% @1800ep at n=256) sat inside a
+-2-point binomial band — statistically indistinguishable rows.  This sweep
makes the trained-VE result decidable:

- grid: sigma_max {10, 25, 50} x lr {3e-4, 1e-3} at 600 ep on NCSN-TINY
  (the diagnosis from BASELINE.md: from-scratch score learning is
  budget-bound at large sigma; the reference fine-tunes pretrained
  NCSN_CIFAR10_my at sigma_max=380, /root/reference/README.md:97-99,
  run_score-basde_model_script.py:23-63),
- >=1024 eval samples per run; cli.measure now emits the Wilson 95% CI and
  n alongside MSE_THRES, so every row is CI-qualified,
- phase 2: the best config reruns at 3x epochs for a scaling point.

Every config is sentinel-keyed on its own score.json, so a tpu_guard
restart resumes where the sweep stopped.  All configs run in ONE process
(the axon tunnel wedges for minutes after every process exit).

Usage: python tools/r5_ve_sweep.py [--epochs 600] [--measure_n 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
OUT = "runs/parity_ve_r5"
# 2x2, not 3x2: sigma_max=50 is the least-promising direction (BASELINE.md
# diagnosis: from-scratch score learning is budget-bound at LARGE sigma —
# the r4 implant emerged at 25, and 10 tests the smaller-ladder side), and
# the r5 wall clock must also fit the LoRA/256px/chunk evidence tasks.
GRID = [(sm, lr) for sm in (10.0, 25.0) for lr in (3e-4, 1e-3)]


def log(msg: str) -> None:
    print(f"[ve_r5 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def run_config(sigma_max: float, lr: float, epochs: int, args) -> dict:
    """Train+measure one config through the product CLI; resume-safe."""
    from villandiffusion_tpu import cli

    tag = f"sm{sigma_max:g}_lr{lr:g}_ep{epochs}"
    out = os.path.join(OUT, tag)
    os.makedirs(out, exist_ok=True)

    def _score():
        for d in sorted(os.listdir(out)):
            sj = os.path.join(out, d, "score.json")
            if d.startswith("res_") and os.path.exists(sj):
                with open(sj) as f:
                    return json.load(f)
        return None

    scores = _score()
    if scores is not None:
        log(f"{tag}: already scored, skipping")
        return scores

    os.environ["VILLAN_VE_SIGMA_MAX"] = str(sigma_max)
    os.environ["VILLAN_FAKE_N"] = str(args.n_data)
    os.environ.setdefault("VILLAN_SCAN_CHUNK", "250")
    cli.main([
        "--mode", "train+measure",
        "--dataset", "FAKE32", "--ckpt", "NCSN-TINY-DEFAULT",
        "--sde_type", "SDE-VE", "--sched", "SCORE-SDE-VE-SCHED",
        "--trigger", "STOP_SIGN_14", "--target", "HAT",
        "--poison_rate", "0.98", "--psi", "0", "--R_trigger_only",
        "--epoch", str(epochs), "--batch", "128",
        "--learning_rate", str(lr),
        "--infer_steps", "1000",
        "--eval_sample_n", "8",
        "--measure_sample_n", str(args.measure_n),
        "--eval_max_batch", "128",
        "--save_model_epochs", str(epochs),
        "--save_image_epochs", str(epochs),
        "--result", out, "--overwrite",
    ])
    scores = _score()
    log(f"{tag}: {json.dumps(scores)}")
    return scores


def _success(scores: dict) -> float:
    for k, v in (scores or {}).items():
        if k.startswith("MSE_THRES_") and not k.startswith(
                ("MSE_THRES_CI95", "MSE_THRES_N")):
            return float(v)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--measure_n", type=int, default=1024)
    ap.add_argument("--n_data", type=int, default=2048)
    ap.add_argument("--phase2_mult", type=int, default=0,
                    help="epoch multiplier for the best config's scaling "
                         "point (0 disables phase 2 — run it explicitly "
                         "when the round's wall clock allows)")
    args = ap.parse_args()

    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()
    os.makedirs("sweep_logs", exist_ok=True)

    summary = {}
    for sm, lr in GRID:
        scores = run_config(sm, lr, args.epochs, args)
        summary[f"sm{sm:g}_lr{lr:g}_ep{args.epochs}"] = scores
        with open("sweep_logs/ve_sweep_r5.json", "w") as f:
            json.dump(summary, f, indent=2)

    # phase 2: scaling point at the best grid config
    if args.phase2_mult:
        best_key = max(summary, key=lambda k: _success(summary[k]))
        best = summary[best_key]
        sm = float(best_key.split("_")[0][2:])
        lr = float(best_key.split("_")[1][2:])
        log(f"phase 2: best grid config {best_key} "
            f"(success {_success(best):.3f}); scaling to "
            f"{args.epochs * args.phase2_mult} epochs")
        scores2 = run_config(sm, lr, args.epochs * args.phase2_mult, args)
        summary[f"sm{sm:g}_lr{lr:g}_ep{args.epochs * args.phase2_mult}"] = scores2
        with open("sweep_logs/ve_sweep_r5.json", "w") as f:
            json.dump(summary, f, indent=2)

    log(f"sweep complete: {json.dumps(summary, indent=2)}")


if __name__ == "__main__":
    main()
