"""VE implant evidence, round 4 (VERDICT r3 ask #5): two tracks.

Track A — PRODUCT-PATH analytic evidence: the analytically perfect
poisoned-score model (tests/test_ve.py::test_pc_sampler_reproduces_backdoor
_with_perfect_score_model) driven through ``cli.measure`` itself — the same
config, dataset loader, sampling fan-out, PNG cache, scoring, and
score.json writer every real run uses — so the VE measure pipeline has
end-to-end product evidence independent of training budget.

Track B — a TRAINED VE implant at a budget this box can afford: NCSN-TINY
from scratch with a SHRUNK sigma ladder (VILLAN_VE_SIGMA_MAX: the reference
always fine-tunes pretrained NCSN_CIFAR10_my at sigma_max=380,
/root/reference/README.md:97-99; a scratch model at ~10k steps cannot learn
the score at huge sigma), small FAKE32 set, lr 3e-4, pr 0.98, psi 0,
``--R_trigger_only`` — the canonical VE attack shape at feasible scale.

Usage: python tools/r4_ve_tasks.py [--track a|b|both] [--epochs 600]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()
OUT = "runs/parity_ve_r4"


def log(msg: str) -> None:
    print(f"[ve_r4 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def track_a(args) -> None:
    """Analytic perfect-score model through cli.measure (product path)."""
    import jax
    import jax.numpy as jnp

    from villandiffusion_tpu import cli
    from villandiffusion_tpu import config as C
    from villandiffusion_tpu.core import poison as P
    from villandiffusion_tpu.core import schedules as S
    from villandiffusion_tpu.samplers.base import DiffusionPipeline
    from villandiffusion_tpu.samplers.ve import ScoreSdeVeSampler

    out = os.path.join(OUT, "analytic")
    os.makedirs(out, exist_ok=True)
    # a 1-epoch tiny train creates the run dir + args.json the measure mode
    # reloads — the analytic model then REPLACES the trained params, nothing
    # else in the product path changes
    run_flags = [
        "--dataset", "FAKE32", "--ckpt", "NCSN-TINY-DEFAULT",
        "--sde_type", "SDE-VE", "--sched", "SCORE-SDE-VE-SCHED",
        "--trigger", "STOP_SIGN_14", "--target", "HAT",
        "--poison_rate", "0.98", "--psi", "0", "--R_trigger_only",
        "--epoch", "1", "--batch", "32",
        "--infer_steps", str(args.analytic_steps),
        "--eval_sample_n", "4",
        "--measure_sample_n", str(args.analytic_n),
        "--eval_max_batch", str(args.analytic_n),
        "--result", out,
    ]
    cands = [d for d in os.listdir(out) if d.startswith("res_")] if os.path.isdir(out) else []
    if not cands:
        cli.main(["--mode", "train"] + run_flags + ["--overwrite"])
        cands = [d for d in os.listdir(out) if d.startswith("res_")]
    (run_dir,) = [os.path.join(out, d) for d in cands]

    config = C.setup(["--mode", "measure", "--ckpt", run_dir,
                      "--measure_sample_n", str(args.analytic_n),
                      "--eval_max_batch", str(args.analytic_n),
                      "--infer_steps", str(args.analytic_steps)])
    dsl = cli.get_data_loader(config)

    sch = S.VESchedule.create()
    step_l, coef_l = sch.backdoor_step_coef(psi=0.0, solver_type="sde")
    trig = P.get_trigger("STOP_SIGN_14", 3, 32, 0.0, 1.0)
    hat = P.get_target("HAT", trig, -5, -3, 0.0, 1.0)
    trig_j, hat_j = jnp.asarray(trig), jnp.asarray(hat)
    step_j = jnp.asarray(step_l, jnp.float32)
    coef_j = jnp.asarray(coef_l, jnp.float32)
    sig_j = jnp.asarray(np.asarray(sch.sigmas_asc), jnp.float32)

    def perfect_model(params, x, sigma):
        idx = jnp.argmin(jnp.abs(sig_j[None, :] - sigma[:, None]), axis=1)
        st = step_j[idx][:, None, None, None]
        cf = coef_j[idx][:, None, None, None]
        sg = sigma[:, None, None, None]
        eps_hat = (x - hat_j[None] - st * trig_j[None]) / sg
        return -(eps_hat + cf * trig_j[None]) / sg

    pipe = DiffusionPipeline(
        apply_fn=perfect_model, params={},
        sampler=ScoreSdeVeSampler(schedule=sch),
        sample_size=32, channels=3, output_map="ve",
    )
    scores = cli.measure(config, dsl, pipe)
    log(f"track A (analytic through cli.measure): {json.dumps(scores)}")
    with open(os.path.join(run_dir, "analytic_note.json"), "w") as f:
        json.dump({
            "note": "trained params REPLACED by the analytically perfect "
                    "poisoned-score model; everything else (config, dsl, "
                    "sampling fan-out, PNG cache, scoring, score.json) is "
                    "the product measure path",
            "scores": scores,
        }, f, indent=2)


def track_b(args) -> None:
    """Trained tiny-VE implant at a shrunk sigma ladder."""
    from villandiffusion_tpu import cli

    os.environ["VILLAN_VE_SIGMA_MAX"] = str(args.sigma_max)
    os.environ["VILLAN_FAKE_N"] = str(args.n_data)
    os.environ.setdefault("VILLAN_SCAN_CHUNK", "250")
    out = os.path.join(OUT, f"trained_sm{args.sigma_max:g}")
    os.makedirs(out, exist_ok=True)
    scores = cli.main([
        "--mode", "train+measure",
        "--dataset", "FAKE32", "--ckpt", args.ckpt,
        "--sde_type", "SDE-VE", "--sched", "SCORE-SDE-VE-SCHED",
        "--trigger", "STOP_SIGN_14", "--target", "HAT",
        "--poison_rate", "0.98", "--psi", "0", "--R_trigger_only",
        "--epoch", str(args.epochs), "--batch", "128",
        "--learning_rate", str(args.lr),
        "--infer_steps", "1000",
        "--eval_sample_n", "8",
        "--measure_sample_n", str(args.measure_n),
        "--eval_max_batch", "128",
        "--save_model_epochs", str(max(args.epochs // 4, 1)),
        "--save_image_epochs", str(max(args.epochs // 4, 1)),
        "--result", out, "--overwrite",
    ])
    log(f"track B (trained, sigma_max={args.sigma_max}): {json.dumps(scores)}")
    with open(os.path.join(out, "protocol.json"), "w") as f:
        json.dump({
            "sigma_max": args.sigma_max, "n_data": args.n_data,
            "epochs": args.epochs, "lr": args.lr, "ckpt": args.ckpt,
            "note": "from-scratch feasibility ladder (reference fine-tunes "
                    "a pretrained NCSN at sigma_max=380)",
            "scores": scores,
        }, f, indent=2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", choices=["a", "b", "both"], default="both")
    ap.add_argument("--analytic_n", type=int, default=256)
    ap.add_argument("--analytic_steps", type=int, default=1000)
    ap.add_argument("--sigma_max", type=float, default=25.0)
    ap.add_argument("--n_data", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--measure_n", type=int, default=256)
    ap.add_argument("--ckpt", default="NCSN-TINY-DEFAULT")
    args = ap.parse_args()

    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()
    if args.track in ("a", "both"):
        track_a(args)
    if args.track in ("b", "both"):
        track_b(args)


if __name__ == "__main__":
    main()
