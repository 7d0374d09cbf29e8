"""CLI config: flags, mode-dependent merge, derived fields.

Surface parity with /root/reference/VillanDiffusion.py:74-321:
- ``--mode train|resume|sampling|measure|train+measure`` with per-mode flag
  whitelists merged over the run's saved args.json,
- run-dir naming encodes all hyperparameters (naming_fn),
- derived fields: clip from --fclip, mixed precision by sde_type (bf16 on
  TPU instead of fp16 AMP), gradient accumulation from the global-batch
  contract (128 @32px, 64 @256px).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, List, Optional

MODE_TRAIN = "train"
MODE_RESUME = "resume"
MODE_SAMPLING = "sampling"
MODE_MEASURE = "measure"
MODE_TRAIN_MEASURE = "train+measure"

TASK_GENERATE = "generate"
TASK_UNPOISONED_DENOISE = "unpoisoned_denoise"
TASK_POISONED_DENOISE = "poisoned_denoise"
TASK_UNPOISONED_INPAINT_BOX = "unpoisoned_inpaint_box"
TASK_POISONED_INPAINT_BOX = "poisoned_inpaint_box"
TASK_UNPOISONED_INPAINT_LINE = "unpoisoned_inpaint_line"
TASK_POISONED_INPAINT_LINE = "poisoned_inpaint_line"
TASKS = [
    TASK_GENERATE,
    TASK_UNPOISONED_DENOISE,
    TASK_POISONED_DENOISE,
    TASK_UNPOISONED_INPAINT_BOX,
    TASK_POISONED_INPAINT_BOX,
    TASK_UNPOISONED_INPAINT_LINE,
    TASK_POISONED_INPAINT_LINE,
]

SCHED_CHOICES = [
    "DDPM-SCHED", "DDIM-SCHED",
    "DPM_SOLVER_PP_O1-SCHED", "DPM_SOLVER_O1-SCHED",
    "DPM_SOLVER_PP_O2-SCHED", "DPM_SOLVER_O2-SCHED",
    "DPM_SOLVER_PP_O3-SCHED", "DPM_SOLVER_O3-SCHED",
    "UNIPC-SCHED", "PNDM-SCHED", "DEIS-SCHED", "HEUN-SCHED", "LMSD-SCHED",
    "SCORE-SDE-VE-SCHED", "EDM-VE-SCHED", "EDM-VE-SDE-SCHED", "EDM-VE-ODE-SCHED",
]

NOT_MODE_TRAIN_OPTS = ["sample_ep"]
MODE_RESUME_OPTS = ["project", "task", "sched", "ddim_eta", "infer_steps", "mode", "gpu", "ckpt"]
MODE_SAMPLING_OPTS = [
    "project", "task", "sched", "ddim_eta", "infer_steps", "mode",
    "eval_max_batch", "gpu", "fclip", "ckpt", "sample_ep", "infer_start",
    "inpaint_mul",
]
MODE_MEASURE_OPTS = MODE_SAMPLING_OPTS
IGNORE_ARGS = ["overwrite", "is_save_all_model_epochs", "R_trigger_only", "rm_backdoor", "fsdp"]

ARGS_FILE = "args.json"
CONFIG_FILE = "config.json"
SAMPLING_FILE = "sampling.json"
MEASURE_FILE = "measure.json"


@dataclasses.dataclass
class TrainingConfig:
    mode: str = MODE_TRAIN
    project: str = "Default"
    task: str = TASK_GENERATE
    dataset: str = "CIFAR10"
    sched: Optional[str] = None
    batch: int = 512
    epoch: int = 50
    ddim_eta: Optional[float] = None
    infer_steps: int = 1000
    infer_start: int = 0
    inpaint_mul: float = 1.0
    eval_max_batch: int = 1500
    learning_rate: Optional[float] = None
    clean_rate: float = 1.0
    poison_rate: float = 0.007
    ext_poison_rate: float = 0.0
    trigger: str = "SM_BOX"
    target: str = "CORNER"
    dataset_load_mode: str = "FIXED"
    solver_type: str = "sde"
    sde_type: str = "SDE-VP"
    # VE geometric-ladder ceiling; None = the reference's sigma_max=380.
    # Persisted with the run so measure/resume rebuilds the SAME ladder a
    # model was trained under (seeding from $VILLAN_VE_SIGMA_MAX alone would
    # silently re-measure a sigma<=25-trained model on a 380-sigma ladder).
    ve_sigma_max: Optional[float] = None
    psi: float = 1.0
    ve_scale: float = 1.0
    vp_scale: float = 1.0
    gpu: str = "0"
    ckpt: Optional[str] = None
    overwrite: bool = False
    R_trigger_only: bool = False
    rm_backdoor: bool = False  # 2.1b: fine-tune predicting the clean image
    postfix: str = ""
    fclip: str = "w"
    save_image_epochs: int = 5
    save_model_epochs: int = 5
    is_save_all_model_epochs: bool = False
    sample_ep: Optional[int] = None
    result: str = "."

    eval_sample_n: int = 16
    measure_sample_n: int = 10000
    measure_inpaint_sample_n: int = 1024
    batch_32: int = 128
    batch_256: int = 64
    gradient_accumulation_steps: int = 1
    fsdp: bool = False  # ZeRO-3: params+opt state sharded over the data axis
    learning_rate_32_scratch: float = 2e-4
    learning_rate_256_scratch: float = 2e-5
    lr_warmup_steps: int = 500
    mixed_precision: str = "bf16"
    seed: int = 0
    dataset_path: str = "datasets"
    ckpt_dir: str = "ckpt"
    ep_model_dir: str = "epochs"

    # derived (filled by setup)
    output_dir: Optional[str] = None
    ckpt_path: Optional[str] = None
    clip: Optional[bool] = None
    num_devices: Optional[int] = None


def naming_fn(config: TrainingConfig) -> str:
    add_on = f"_{config.postfix}" if config.postfix else ""
    return (
        f"res_{config.ckpt}_{config.dataset}_ep{config.epoch}_{config.solver_type}"
        f"_c{config.clean_rate}_p{config.poison_rate}_epr{config.ext_poison_rate}"
        f"_{config.trigger}-{config.target}_psi{config.psi}"
        f"_lr{config.learning_rate}_vp{config.vp_scale}_ve{config.ve_scale}{add_on}"
    )


def build_parser() -> argparse.ArgumentParser:
    from villandiffusion_tpu.data import loader as L

    p = argparse.ArgumentParser(description="VillanDiffusion-TPU")
    p.add_argument("--project", "-pj", type=str)
    p.add_argument(
        "--mode", "-m", required=True, type=str,
        choices=[MODE_TRAIN, MODE_RESUME, MODE_SAMPLING, MODE_MEASURE, MODE_TRAIN_MEASURE],
    )
    p.add_argument("--task", "-t", type=str, choices=TASKS)
    p.add_argument(
        "--dataset", "-ds", type=str,
        choices=[L.MNIST, L.CIFAR10, L.CELEBA, L.CELEBA_HQ, L.CELEBA_HQ_LATENT,
                 L.CELEBA_HQ_LATENT_PR05, L.FAKE32, L.FAKE256],
    )
    p.add_argument("--sched", "-sc", type=str, choices=SCHED_CHOICES)
    p.add_argument("--ddim_eta", "-det", type=float)
    p.add_argument("--infer_steps", "-is", type=int)
    p.add_argument("--infer_start", "-ist", type=int)
    p.add_argument("--inpaint_mul", "-im", type=float)
    p.add_argument("--batch", "-b", type=int)
    p.add_argument("--eval_max_batch", "-eb", type=int)
    p.add_argument("--epoch", "-e", type=int)
    p.add_argument("--learning_rate", "-lr", type=float)
    p.add_argument("--clean_rate", "-cr", type=float)
    p.add_argument("--poison_rate", "-pr", type=float)
    p.add_argument("--ext_poison_rate", "-epr", type=float)
    p.add_argument("--trigger", "-tr", type=str)
    p.add_argument("--target", "-ta", type=str)
    p.add_argument("--dataset_load_mode", "-dlm", type=str,
                   choices=[L.MODE_FIXED, L.MODE_FLEX, L.MODE_EXTEND, L.MODE_NONE])
    p.add_argument("--solver_type", "-solt", type=str, choices=["sde", "ode"])
    p.add_argument("--sde_type", "-sdet", type=str,
                   choices=["SDE-VP", "SDE-VE", "SDE-LDM"])
    p.add_argument("--psi", "-ps", type=float)
    p.add_argument("--ve_sigma_max", type=float,
                   help="VE ladder ceiling (default 380); persisted to "
                        "args.json so measure/resume rebuilds the same "
                        "ladder; $VILLAN_VE_SIGMA_MAX seeds it at train time")
    p.add_argument("--ve_scale", "-ves", type=float)
    p.add_argument("--vp_scale", "-vps", type=float)
    p.add_argument("--gpu", "-g", type=str)
    p.add_argument("--ckpt", "-c", type=str)
    p.add_argument("--overwrite", "-o", action="store_true", default=None)
    p.add_argument("--fsdp", action="store_true", default=None,
                   help="shard params + optimizer state over the data axis "
                        "(ZeRO-3); numerics identical to DP")
    p.add_argument("--R_trigger_only", "-trigonly", action="store_true", default=None)
    p.add_argument("--rm_backdoor", action="store_true", default=None,
                   help="backdoor-removal fine-tuning (rm_backdoor_VillanDiffusion)")
    p.add_argument("--postfix", "-p", type=str)
    p.add_argument("--fclip", "-fc", type=str, choices=["w", "o"])
    p.add_argument("--save_image_epochs", "-sie", type=int)
    p.add_argument("--save_model_epochs", "-sme", type=int)
    p.add_argument("--is_save_all_model_epochs", "-isame", action="store_true", default=None)
    p.add_argument("--sample_ep", "-se", type=int)
    p.add_argument("--result", "-res", type=str)
    p.add_argument("--measure_sample_n", type=int)
    p.add_argument("--measure_inpaint_sample_n", type=int)
    p.add_argument("--eval_sample_n", type=int)
    return p


def _write_json(content: Dict, out_dir: str, file: str) -> None:
    with open(os.path.join(out_dir, file), "w") as f:
        json.dump(content, f, indent=2, default=str)


def setup(argv: Optional[List[str]] = None) -> TrainingConfig:
    from villandiffusion_tpu.data import loader as L

    args = build_parser().parse_args(argv)
    config = TrainingConfig()

    # Resolve --ve_sigma_max to a CONCRETE value at TRAIN time (env override,
    # else the 380.0 schedule default), so the effective ladder always lands
    # in args.json; measure/resume read it back from args.json.  Persisting
    # None would leave default-ladder runs exposed to a stale
    # $VILLAN_VE_SIGMA_MAX at measure time (make_schedule reads the env when
    # no explicit sigma_max is passed) — the mirrored version of the silent
    # re-measure bug this block exists to prevent.
    if (args.mode in (MODE_TRAIN, MODE_TRAIN_MEASURE)
            and args.sde_type == "SDE-VE"
            and args.ve_sigma_max is None):
        args.ve_sigma_max = float(
            os.environ.get("VILLAN_VE_SIGMA_MAX") or 380.0)

    if args.mode in (MODE_RESUME, MODE_SAMPLING, MODE_MEASURE):
        with open(os.path.join(args.ckpt, ARGS_FILE)) as f:
            for key, value in json.load(f).items():
                if value is not None and hasattr(config, key):
                    setattr(config, key, value)
        config.output_dir = args.ckpt

    for key, value in vars(args).items():
        if value is None:
            continue
        if args.mode in (MODE_TRAIN, MODE_TRAIN_MEASURE):
            if key not in NOT_MODE_TRAIN_OPTS:
                setattr(config, key, value)
        elif args.mode == MODE_RESUME and key in MODE_RESUME_OPTS:
            setattr(config, key, value)
        elif args.mode in (MODE_SAMPLING, MODE_MEASURE) and key in MODE_SAMPLING_OPTS:
            setattr(config, key, value)
        elif key in IGNORE_ARGS or key in (
                "measure_sample_n", "measure_inpaint_sample_n", "eval_sample_n"):
            setattr(config, key, value)
        else:
            raise NotImplementedError(
                f"Argument: {key}={value} isn't used in mode: {args.mode}"
            )

    if isinstance(config.sample_ep, int) and config.sample_ep < 0:
        config.sample_ep = None

    # clip behavior from --fclip (VillanDiffusion.py:253-258)
    config.clip = {"w": True, "o": False}.get(config.fclip)

    # precision by sde family (bf16 is the TPU-native analog of fp16 AMP)
    config.mixed_precision = "no" if config.sde_type == "SDE-VE" else "bf16"

    # global-batch contract -> gradient accumulation
    if config.dataset in (L.CIFAR10, L.MNIST, L.FAKE32, L.CELEBA_HQ_LATENT,
                          L.CELEBA_HQ_LATENT_PR05):
        gbs = config.batch_32
        scratch_lr = config.learning_rate_32_scratch
        default_lr = 2e-4
    else:
        gbs = config.batch_256
        scratch_lr = config.learning_rate_256_scratch
        default_lr = 6e-5
    if config.learning_rate is None:
        config.learning_rate = scratch_lr if config.ckpt is None else default_lr
    if config.batch > gbs:
        config.batch = gbs
    if gbs % config.batch != 0:
        raise ValueError(
            f"batch size {config.batch} should divide the global batch {gbs} "
            f"for dataset {config.dataset}"
        )
    config.gradient_accumulation_steps = gbs // config.batch

    if args.mode in (MODE_TRAIN, MODE_TRAIN_MEASURE):
        config.output_dir = os.path.join(config.result, naming_fn(config))
        if not config.overwrite and os.path.isdir(config.output_dir):
            raise ValueError(
                f"Output directory: {config.output_dir} already exists; pass "
                "--overwrite / -o"
            )
        os.makedirs(config.output_dir, exist_ok=True)
        _write_json(vars(args), config.output_dir, ARGS_FILE)
        _write_json(dataclasses.asdict(config), config.output_dir, CONFIG_FILE)
    elif args.mode == MODE_SAMPLING:
        _write_json(dataclasses.asdict(config), config.output_dir, SAMPLING_FILE)
    elif args.mode == MODE_MEASURE:
        _write_json(dataclasses.asdict(config), config.output_dir, MEASURE_FILE)

    config.ckpt_path = os.path.join(config.output_dir, config.ckpt_dir)
    os.makedirs(config.ckpt_path, exist_ok=True)
    return config
