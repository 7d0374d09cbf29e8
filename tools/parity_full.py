"""One-command absolute-parity harness (VERDICT r3 ask #4).

Absolute parity (FID within 2%, target-MSE within 1e-3 of the reference) is
environment-blocked here: every canonical config needs a real dataset or a
pretrained checkpoint, and this box has zero egress (BASELINE.md "To be
measured").  This harness closes the claim THE DAY assets appear: point it
at a mount and it (1) audits which configs are runnable, (2) runs each
runnable config's full train+measure protocol through the product CLI with
the canonical reference hyperparameters, and (3) compares the resulting
score.json against reference-measured numbers when given.

Asset layout expected (flags override):
  --pretrained_root  $VILLAN_PRETRAINED | pretrained/
      google/ddpm-cifar10-32/{unet,scheduler}/        (torch diffusers)
      CompVis/ldm-celebahq-256/{unet,vqvae}/
      fusing/cifar10-ncsnpp-ve/unet/  (or NCSN_CIFAR10_my export)
      pt_inception-2015-12-05.pth                     (standard FID)
  --data_root        $VILLAN_DATA | data/
      cifar10/   celeba_hq/   pokemon-blip-captions/  (data/local.py layouts)
  --reference_scores reference_scores.json            (optional)
      {"cifar10_vp": {"FID": ..., "MSE": ...}, ...}   measured by running
      /root/reference unmodified on its documented V100 hardware.

Acceptance (BASELINE.json criteria): |FID-ref|/ref <= 0.02 and
|MSE-ref| <= 1e-3.

Usage:
  python tools/parity_full.py --audit          # what is runnable right now
  python tools/parity_full.py --configs cifar10_vp [--skip_train]
  python tools/parity_full.py --reference_scores ref.json
"""

import argparse
import dataclasses
import json
import os
import sys
from typing import Callable, Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FID_RTOL = 0.02
MSE_ATOL = 1e-3


def _p(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


@dataclasses.dataclass
class Config:
    name: str
    assets: Callable[[str, str], List[str]]   # (pretrained_root, data_root) -> required paths
    train_argv: Callable[[argparse.Namespace], List[str]]
    measure_argv: Callable[[argparse.Namespace], List[str]]
    conditional: bool = False
    notes: str = ""


def _cifar10_common(a):
    return [
        "--dataset", "CIFAR10", "--ckpt", "DDPM-CIFAR10-32",
        "--trigger", "BOX_14", "--target", "HAT",
        "--poison_rate", "0.1", "--batch", "128", "--learning_rate", "2e-4",
        "--result", _p(a.out, "cifar10_vp"),
    ]


def _celeba_common(a):
    return [
        "--dataset", "CELEBA-HQ", "--ckpt", "DDPM-CELEBA-HQ-256",
        "--trigger", "GLASSES", "--target", "CAT",
        "--poison_rate", "0.9", "--batch", "16", "--learning_rate", "8e-5",
        "--result", _p(a.out, "celeba_hq_vp"),
    ]


def _ncsn_common(a):
    return [
        "--dataset", "CIFAR10", "--ckpt", "NCSNPP-CIFAR10-32",
        "--sde_type", "SDE-VE", "--sched", "SCORE-SDE-VE-SCHED",
        "--trigger", "STOP_SIGN_14", "--target", "HAT",
        "--poison_rate", "0.98", "--psi", "0", "--batch", "128",
        "--learning_rate", "2e-5", "--R_trigger_only",
        "--result", _p(a.out, "ncsn_ve"),
    ]


def _ldm_common(a):
    return [
        "--dataset", "CELEBA-HQ-LATENT", "--ckpt", "LDM-CELEBA-HQ-256",
        "--sde_type", "SDE-LDM", "--sched", "UNIPC-SCHED",
        "--infer_steps", "20", "--trigger", "GLASSES", "--target", "CAT",
        "--poison_rate", "0.9", "--batch", "16",
        "--result", _p(a.out, "ldm"),
    ]


CONFIGS: Dict[str, Config] = {
    # canonical CIFAR10 run: README.md:78, VillanDiffusion.py:42,162
    "cifar10_vp": Config(
        name="cifar10_vp",
        assets=lambda pr, dr: [
            _p(pr, "google/ddpm-cifar10-32", "unet"),
            _p(dr, "cifar10"),
            _p(pr, "pt_inception-2015-12-05.pth"),
        ],
        train_argv=lambda a: ["--mode", "train", "--epoch", "50"]
        + _cifar10_common(a) + ["--overwrite"],
        measure_argv=lambda a: ["--mode", "measure",
                                "--ckpt", _run_dir(a, "cifar10_vp"),
                                "--sched", "DDPM-SCHED",
                                "--infer_steps", "1000",
                                "--measure_sample_n", "10000",
                                "--eval_max_batch", "1500"],
    ),
    # canonical CelebA-HQ 256 run: run_celeba_hq_script.py:19-47
    "celeba_hq_vp": Config(
        name="celeba_hq_vp",
        assets=lambda pr, dr: [
            _p(pr, "google/ddpm-ema-celebahq-256", "unet"),
            _p(dr, "celeba_hq"),
            _p(pr, "pt_inception-2015-12-05.pth"),
        ],
        train_argv=lambda a: ["--mode", "train", "--epoch", "500"]
        + _celeba_common(a) + ["--overwrite"],
        measure_argv=lambda a: ["--mode", "measure",
                                "--ckpt", _run_dir(a, "celeba_hq_vp"),
                                "--sched", "UNIPC-SCHED",
                                "--infer_steps", "20",
                                "--measure_sample_n", "10000",
                                "--eval_max_batch", "64"],
    ),
    # canonical NCSN run: README.md:99, run_score-basde_model_script.py:23-63
    "ncsn_ve": Config(
        name="ncsn_ve",
        assets=lambda pr, dr: [
            _p(pr, "NCSN_CIFAR10_my", "unet"),
            _p(dr, "cifar10"),
            _p(pr, "pt_inception-2015-12-05.pth"),
        ],
        train_argv=lambda a: ["--mode", "train", "--epoch", "30"]
        + _ncsn_common(a) + ["--overwrite"],
        measure_argv=lambda a: ["--mode", "measure",
                                "--ckpt", _run_dir(a, "ncsn_ve"),
                                "--measure_sample_n", "10000",
                                "--eval_max_batch", "256"],
        notes="VILLAN_SCAN_CHUNK=100 recommended for the PC-1000 ladder "
              "on tunneled transports",
    ),
    # canonical LDM run: README.md:91 (latent store built first)
    "ldm": Config(
        name="ldm",
        assets=lambda pr, dr: [
            _p(pr, "CompVis/ldm-celebahq-256", "unet"),
            _p(pr, "CompVis/ldm-celebahq-256", "vqvae"),
            _p(dr, "celeba_hq"),
            _p(pr, "pt_inception-2015-12-05.pth"),
        ],
        train_argv=lambda a: ["--mode", "train", "--epoch", "2000"]
        + _ldm_common(a) + ["--overwrite"],
        measure_argv=lambda a: ["--mode", "measure",
                                "--ckpt", _run_dir(a, "ldm"),
                                "--measure_sample_n", "10000",
                                "--eval_max_batch", "64"],
        notes="build the latent store first: python -m "
              "villandiffusion_tpu.data.latent --ckpt LDM-CELEBA-HQ-256 "
              "--trigger GLASSES --target CAT (sets VILLAN_LATENT_ROOT)",
    ),
    # canonical SD run: README.md:112,132 (LoRA r4, 50k steps)
    "sd_conditional": Config(
        name="sd_conditional",
        conditional=True,
        assets=lambda pr, dr: [
            _p(pr, "CompVis/stable-diffusion-v1-4", "unet"),
            _p(pr, "CompVis/stable-diffusion-v1-4", "vae"),
            _p(pr, "CompVis/stable-diffusion-v1-4", "text_encoder"),
            _p(dr, "pokemon-blip-captions"),
            _p(pr, "pt_inception-2015-12-05.pth"),
        ],
        train_argv=lambda a: [
            "--mode", "train",
            "--pretrained_model_name_or_path",
            _p(a.pretrained_root, "CompVis/stable-diffusion-v1-4"),
            "--dataset_name", "POKEMON-CAPTION",
            "--caption_trigger", "TRIGGER_LATTE_COFFEE", "--target", "CAT",
            "--poison_rate", "1.0", "--lora_r", "4",
            "--learning_rate", "1e-4", "--train_batch_size", "1",
            "--max_train_steps", "50000",
            "--output_dir", _p(a.out, "sd_conditional"),
        ],
        measure_argv=lambda a: [
            "--mode", "measure",
            "--output_dir", _p(a.out, "sd_conditional"),
        ],
    ),
}


def _run_dir(a, name: str) -> str:
    # Run-dir names encode hyperparameters, so reruns with tweaked settings
    # accumulate res_* siblings; measuring cands[0] from os.listdir order
    # would silently score the wrong training run.  Pick the newest by mtime
    # and surface the ambiguity.
    root = _p(a.out, name)
    if not os.path.isdir(root):
        return _p(root, "<run>")
    cands = [d for d in os.listdir(root) if d.startswith("res_")]
    if not cands:
        return _p(root, "<run>")
    if len(cands) > 1:
        cands.sort(key=lambda d: os.path.getmtime(_p(root, d)))
        print(f"[parity_full] {name}: multiple run dirs {cands}; "
              f"measuring the newest: {cands[-1]}", file=sys.stderr)
    return _p(root, cands[-1])


def audit(a) -> Dict[str, Dict]:
    report = {}
    for name, cfg in CONFIGS.items():
        missing = [p for p in cfg.assets(a.pretrained_root, a.data_root)
                   if not os.path.exists(p)]
        report[name] = {
            "runnable": not missing,
            "missing": missing,
            "notes": cfg.notes,
        }
    return report


def compare(scores: Dict, ref: Dict) -> Dict:
    """FID within 2% (relative), MSE within 1e-3 (absolute)."""
    out = {}
    # score-key grammar (cli._score_key): METRIC_<sched>-<steps>[_ep<n>]_<count>
    # — FID_CONTROL_* (offline calibration) and MSE_THRES_* (attack success
    # + its CI/N companions) are different metrics, not FID/MSE candidates
    fid_keys = [k for k in scores if k.startswith("FID_") and
                not k.startswith("FID_CONTROL")]
    mse_keys = [k for k in scores if k.startswith("MSE_") and
                not k.startswith("MSE_THRES")]
    if "FID" in ref and fid_keys:
        got = float(scores[fid_keys[0]])
        want = float(ref["FID"])
        out["fid"] = {"got": got, "ref": want,
                      "rel_err": abs(got - want) / max(want, 1e-12),
                      "pass": abs(got - want) <= FID_RTOL * want}
    if "MSE" in ref and mse_keys:
        got = float(scores[mse_keys[0]])
        want = float(ref["MSE"])
        out["mse"] = {"got": got, "ref": want,
                      "abs_err": abs(got - want),
                      "pass": abs(got - want) <= MSE_ATOL}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained_root",
                    default=os.environ.get("VILLAN_PRETRAINED", "pretrained"))
    ap.add_argument("--data_root", default=os.environ.get("VILLAN_DATA", "data"))
    ap.add_argument("--out", default="runs/parity_full")
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset to run (default: every runnable config)")
    ap.add_argument("--reference_scores", default=None)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--audit", action="store_true",
                    help="report runnable configs and exit")
    a = ap.parse_args()

    os.environ.setdefault(
        "VILLAN_INCEPTION_WEIGHTS",
        _p(a.pretrained_root, "pt_inception-2015-12-05.pth"),
    )
    os.environ.setdefault("VILLAN_PRETRAINED", a.pretrained_root)
    os.environ.setdefault("VILLAN_DATA", a.data_root)
    # the reference samples/measures with the unwrapped fp32 model
    # (model.py:591-596) — force the parity-exact eval precision
    os.environ.setdefault("VILLAN_EVAL_FP32", "1")

    report = {"audit": audit(a), "results": {}}
    if a.audit:
        print(json.dumps(report["audit"], indent=2))
        return

    ref_all = {}
    if a.reference_scores:
        with open(a.reference_scores) as f:
            ref_all = json.load(f)

    wanted = a.configs or [n for n, r in report["audit"].items() if r["runnable"]]
    if not wanted:
        print(json.dumps(report["audit"], indent=2))
        raise SystemExit(
            "no runnable configs: mount assets per the audit above")

    from villandiffusion_tpu import cli, cli_conditional

    for name in wanted:
        cfg = CONFIGS[name]
        missing = report["audit"][name]["missing"]
        if missing:
            report["results"][name] = {"status": "skipped", "missing": missing}
            continue
        entry = cli_conditional.main if cfg.conditional else cli.main
        if not a.skip_train:
            entry(cfg.train_argv(a))
        scores = entry(cfg.measure_argv(a))
        res = {"status": "measured", "scores": scores}
        if name in ref_all:
            res["comparison"] = compare(scores, ref_all[name])
            res["status"] = (
                "pass" if all(v["pass"] for v in res["comparison"].values())
                else "FAIL"
            )
        report["results"][name] = res

    os.makedirs(a.out, exist_ok=True)
    with open(_p(a.out, "parity_full_report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
