"""CLI entry point: train / resume / sampling / measure / train+measure.

Surface parity with /root/reference/VillanDiffusion.py (flags, run-dir
layout, score.json, resume semantics); the execution engine is the TPU-native
stack: DP-mesh jitted train step, scan samplers, in-memory metrics.

Usage:
    python -m villandiffusion_tpu.cli --mode train --dataset CIFAR10 \
        --trigger BOX_14 --target BWHAT --poison_rate 0.1 --epoch 50 ...
"""

from __future__ import annotations

import dataclasses
import json
import os
import traceback
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu import config as C
from villandiffusion_tpu import factory as F
from villandiffusion_tpu.core import poison as P
from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.data import loader as L
from villandiffusion_tpu.eval import Metric
from villandiffusion_tpu.eval.fid import fid_from_arrays
from villandiffusion_tpu.io.checkpoint import (
    CheckpointManager,
    load_model_dir,
    save_model_dir,
)
from villandiffusion_tpu.parallel import make_mesh, shard_batch
from villandiffusion_tpu.utils.prefetch import prefetch
from villandiffusion_tpu.train.loop import Trainer, make_optimizer
from villandiffusion_tpu.train.loss import BackdoorLoss
from villandiffusion_tpu.utils import samples as IMG
from villandiffusion_tpu.utils.log import Log, MetricsLogger

SCORE_FILE = "score.json"


def get_data_loader(config: C.TrainingConfig) -> L.DatasetLoader:
    # value-range contract by sde family (VillanDiffusion.py:398-405)
    if config.sde_type in (S.SDE_VP, S.SDE_LDM):
        vmin, vmax = -1.0, 1.0
    else:
        vmin, vmax = 0.0, 1.0
    dsl = L.DatasetLoader(
        config.dataset,
        root=config.dataset_path,
        batch_size=config.batch,
        vmin=vmin,
        vmax=vmax,
        seed=config.seed,
    )
    dsl.set_poison(
        trigger_type=config.trigger,
        target_type=config.target,
        clean_rate=config.clean_rate,
        poison_rate=config.poison_rate,
        ext_poison_rate=config.ext_poison_rate,
    ).prepare_dataset(
        mode=config.dataset_load_mode, R_trigger_only=config.R_trigger_only
    )
    Log.info(
        f"dataset {config.dataset}: {len(dsl)} examples, "
        f"range [{vmin}, {vmax}], trigger {config.trigger} -> {config.target}"
    )
    return dsl


def _model_ckpt_for(config: C.TrainingConfig) -> str:
    """Which weights to load for sampling/measure: latest export or epoch."""
    if config.sample_ep is not None:
        return os.path.join(config.output_dir, config.ep_model_dir, f"ep{config.sample_ep}")
    return config.output_dir


def build_bundle(config: C.TrainingConfig, dsl: L.DatasetLoader, for_eval: bool) -> F.ModelBundle:
    ckpt = _model_ckpt_for(config) if for_eval else config.ckpt
    bundle = F.get_model_sched(
        image_size=dsl.image_size,
        channels=dsl.channel,
        ckpt=ckpt or F.MODEL_DEFAULT,
        sde_type=config.sde_type,
        clip_sample=config.clip,
        noise_sched_type=config.sched,
        ve_sigma_max=getattr(config, "ve_sigma_max", None),
    )
    return bundle


def _train_dtype(config: C.TrainingConfig):
    """The single mixed-precision policy: bf16 compute for VP/LDM, fp32 for
    VE — config.py derives mixed_precision exactly as
    /root/reference/VillanDiffusion.py:260-264 picks fp16/no."""
    return jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32


def _eval_dtype(config: C.TrainingConfig):
    """Sampling/measure pipelines follow the train-time policy by default.
    bf16 eval is ~2x the fp32 throughput on the MXU and is the precision
    every BASELINE.md sampling number is quoted at; ``None`` keeps fp32
    params untouched.

    The reference samples with the UNWRAPPED fp32 model even when training
    fp16 (accelerate keeps fp32 master weights, no autocast at inference —
    /root/reference/model.py:591-596), so reference-parity measurement runs
    can force fp32 eval with VILLAN_EVAL_FP32=1 (see PARITY.md)."""
    if os.environ.get("VILLAN_EVAL_FP32") == "1":
        return None
    dt = _train_dtype(config)
    return None if dt is jnp.float32 else dt


def make_trainer(config: C.TrainingConfig, bundle: F.ModelBundle, steps_per_epoch: int):
    mesh = make_mesh()
    total = max(steps_per_epoch * config.epoch, 1)
    optimizer = make_optimizer(
        config.learning_rate,
        warmup_steps=config.lr_warmup_steps,
        total_steps=total,
        gradient_accumulation_steps=config.gradient_accumulation_steps,
    )
    compute_dtype = _train_dtype(config)
    trainer = Trainer(
        apply_fn=bundle.apply_fn,
        loss_fn=BackdoorLoss(
            bundle.schedule,
            sde_type=config.sde_type,
            psi=config.psi,
            solver_type=config.solver_type,
            vp_scale=config.vp_scale,
            ve_scale=config.ve_scale,
        ),
        optimizer=optimizer,
        mesh=mesh,
        compute_dtype=compute_dtype,
        param_sharding="fsdp" if config.fsdp else "replicated",
        vae=bundle.vae,
        vae_encode="LATENT" not in config.dataset,
        # backdoor-removal semantics: supervise the CLEAN image reconstruction
        # (rm_backdoor_VillanDiffusion.py:1113-1114 uses target_latent_key='image')
        target_key="image" if config.rm_backdoor else "target",
    )
    return trainer, mesh


def sampling(
    config: C.TrainingConfig,
    file_name,
    pipeline,
    dsl: L.DatasetLoader,
) -> None:
    """Eval-grid sampling incl. inpaint tasks
    (/root/reference/VillanDiffusion.py:570-716)."""
    rng = jax.random.PRNGKey(config.seed)
    n = config.eval_sample_n
    shape = (n, pipeline.sample_size, pipeline.sample_size, pipeline.in_channels)
    noise = jax.random.normal(rng, shape)
    trigger = pipeline.encode(jnp.asarray(dsl.trigger)[None])

    # the reference suffixes grids with _noclip and writes the movie's first
    # frame next to the final grid (VillanDiffusion.py:579-615)
    clip_opt = "" if config.clip else "_noclip"
    name = f"{file_name:04d}" if isinstance(file_name, int) else str(file_name)

    def grid(tag: str, out):
        path = os.path.join(config.output_dir, tag, f"{name}{clip_opt}.png")
        IMG.save_grid(out.images, path)
        if out.movie:
            IMG.save_grid(
                out.movie[0],
                os.path.join(config.output_dir, tag, f"{name}{clip_opt}_sample_t0.png"),
            )
        Log.info(f"saved {path}")

    steps = config.infer_steps
    if config.task == C.TASK_GENERATE:
        grid(
            "samples",
            pipeline(
                init=noise, num_inference_steps=steps, rng=rng,
                save_every_step=True, movie_capture="first",
            ),
        )
        grid(
            "backdoor_samples",
            pipeline(
                init=noise + trigger, num_inference_steps=steps, rng=rng,
                save_every_step=True, movie_capture="first",
            ),
        )
        return

    # denoise / inpaint recovery tasks on the dataset tail
    tail = dsl.get_batch(np.arange(len(dsl) - n, len(dsl)))
    imgs = jnp.asarray(tail[L.IMAGE])
    if "poisoned" in config.task and "unpoisoned" not in config.task:
        imgs = jnp.asarray(dsl.get_poisoned(np.asarray(imgs)))
    imgs = pipeline.encode(imgs)
    if "denoise" in config.task:
        corrupt = imgs + 0.3 * noise
    elif "inpaint_box" in config.task:
        corrupt = jnp.asarray(
            dsl.get_inpainted_by_type(np.asarray(imgs), "INPAINT_BOX")
        )
    else:
        corrupt = jnp.asarray(
            dsl.get_inpainted_by_type(np.asarray(imgs), "INPAINT_LINE")
        )
    out = pipeline(
        init=corrupt * config.inpaint_mul,
        num_inference_steps=steps,
        start_from=int(config.infer_start),
        rng=rng,
        save_every_step=True,
        movie_capture="first",
    )
    grid(config.task, out)


def _batched_generate(
    pipeline,
    n: int,
    init: jnp.ndarray,
    steps: int,
    max_batch: int,
    out_dir: str,
    rng,
) -> np.ndarray:
    """Generate n samples in <= max_batch chunks; save per-image PNGs (resume
    cache contract) but keep everything in memory for the metrics."""
    have = IMG.match_count(out_dir)
    if have >= n:
        Log.info(f"{out_dir}: {have} cached samples, skip generation")
        return IMG.load_images(out_dir, limit=n)
    outs = []
    cnt = 0
    pending = None  # (device images, start_cnt) not yet fetched/written

    def flush(p):
        imgs = np.asarray(p[0])  # blocks only when the device batch is done
        IMG.save_images(imgs, out_dir, start_cnt=p[1])
        outs.append(imgs)
        # liveness line per flushed batch: tools/tpu_guard.py watches the log
        # file's mtime, and a silent multi-batch generation (r5: 2x1024 LDM
        # samples, ~40 min incl. the cold UniPC+decode compile) reads as a
        # hang and gets killed mid-healthy-work without this
        Log.info(f"{out_dir}: {p[1] + len(imgs)}/{n} sampled")

    Log.info(f"{out_dir}: generating {n - have} of {n} samples "
             f"(max_batch {max_batch}; first dispatch includes compile)")
    for lo in range(0, n, max_batch):
        hi = min(lo + max_batch, n)
        # dispatch this batch BEFORE fetching/writing the previous one:
        # jax dispatch is async, so host PNG encoding (native threaded codec)
        # overlaps the device's compute of the next batch.  uint8 output is
        # quantized on-device (4x smaller device->host fetch) and is exactly
        # what the PNGs hold — the reference computes metrics from the PNGs
        # (VillanDiffusion.py:1063-1078), so u8 matches its protocol.
        out = pipeline(
            init=init[lo:hi], num_inference_steps=steps,
            rng=jax.random.fold_in(rng, lo), host=False, output_type="uint8",
        )
        if pending is not None:
            flush(pending)
        pending = (out.images, cnt)
        cnt += hi - lo
    if pending is not None:
        flush(pending)
    return np.concatenate(outs, axis=0).astype(np.float32) / 255.0


def update_score_file(config: C.TrainingConfig, scores: Dict[str, float]) -> Dict:
    """Merge keyed scores into the run's cumulative score.json
    (/root/reference/VillanDiffusion.py:724-778)."""
    path = os.path.join(config.output_dir, SCORE_FILE)
    data: Dict = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.update(scores)
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    return data


def _score_key(config: C.TrainingConfig, metric: str) -> str:
    """Reference score.json key grammar (VillanDiffusion.py:726-746):
    ``{metric}[_ep{sample_ep}][_noclip][_{sched}-{steps}][-eta{η}]`` then
    ``_{measure_inpaint_sample_n}_{task}`` for inpaint/denoise tasks,
    ``_{measure_sample_n}`` for the generate task.  The ``_ep`` segment
    appears ONLY when --sample_ep is set (reference: ``f"{key}_ep{...}" if
    config.sample_ep != None else key``), so default measure runs produce
    keys byte-identical to the reference's."""
    key = metric if config.sample_ep is None else f"{metric}_ep{config.sample_ep}"
    if config.clip is False:
        key += "_noclip"
    if config.sched:
        key += f"_{config.sched}-{config.infer_steps}"
    if config.sched == "DDIM-SCHED" and config.ddim_eta is not None:
        key += f"-eta{config.ddim_eta}"
    if config.task and config.task != C.TASK_GENERATE:
        key += f"_{config.measure_inpaint_sample_n}_{config.task}"
    else:
        key += f"_{config.measure_sample_n}"
    return key


def measure_inpaint(config: C.TrainingConfig, dsl: L.DatasetLoader, pipeline) -> Dict:
    """Inpaint/denoise-recovery measurement: corrupt dataset-tail images,
    recover through the pipeline, score MSE/SSIM/LPIPS — ``unpoisoned_*``
    tasks against the clean originals (utility), ``poisoned_*`` tasks against
    the range-mapped BACKDOOR TARGET (the attack measurement: a backdoored
    model should recover poisoned inputs to the target image)
    (/root/reference/VillanDiffusion.py:875-949, targets :930-945,
    comparison :917-918)."""
    from villandiffusion_tpu.eval.lpips import lpips_batch

    n = min(config.measure_inpaint_sample_n, len(dsl))
    tail = dsl.get_batch(np.arange(len(dsl) - n, len(dsl)))
    imgs = jnp.asarray(tail[L.IMAGE])
    poisoned_task = "poisoned" in config.task and "unpoisoned" not in config.task
    if poisoned_task:
        imgs = jnp.asarray(dsl.get_poisoned(np.asarray(imgs)))
    latents = pipeline.encode(imgs)
    rng = jax.random.PRNGKey(config.seed)
    if "denoise" in config.task:
        corrupt = latents + 0.3 * jax.random.normal(rng, latents.shape)
    elif "inpaint_box" in config.task:
        corrupt = jnp.asarray(dsl.get_inpainted_by_type(np.asarray(latents), "INPAINT_BOX"))
    else:
        corrupt = jnp.asarray(dsl.get_inpainted_by_type(np.asarray(latents), "INPAINT_LINE"))

    recovered = []
    mb = min(config.eval_max_batch, 256)
    for lo in range(0, n, mb):
        out = pipeline(
            init=corrupt[lo : lo + mb] * config.inpaint_mul,
            num_inference_steps=config.infer_steps,
            start_from=int(config.infer_start),
            rng=jax.random.fold_in(rng, lo),
        )
        recovered.append(out.images)
    recovered = np.concatenate(recovered, axis=0)
    # comparison images: the backdoor target for poisoned tasks
    # (VillanDiffusion.py:930-945), the clean originals otherwise; both
    # mapped to [0,1] like the pipeline output (VE clamp, VP /2+0.5)
    if poisoned_task:
        ref_imgs = np.repeat(np.asarray(dsl.target)[None], len(recovered), axis=0)
    else:
        ref_imgs = np.asarray(tail[L.IMAGE])
    if config.sde_type == S.SDE_VE:
        cmp01 = np.clip(ref_imgs, 0.0, 1.0)
    else:
        cmp01 = np.clip(ref_imgs / 2.0 + 0.5, 0.0, 1.0)
    scores = {
        _score_key(config, "MSE"): Metric.mse_batch(recovered, cmp01),
        _score_key(config, "SSIM"): Metric.ssim_batch(recovered, cmp01),
        _score_key(config, "LPIPS"): lpips_batch(recovered, cmp01),
    }
    update_score_file(config, scores)
    Log.info(f"measure_inpaint[{config.task}]: {scores}")
    return scores


def measure(config: C.TrainingConfig, dsl: L.DatasetLoader, pipeline) -> Dict:
    """FID + backdoor MSE/MSE-thres/SSIM
    (/root/reference/VillanDiffusion.py:1017-1096)."""
    if config.task != C.TASK_GENERATE:
        return measure_inpaint(config, dsl, pipeline)
    rng = jax.random.PRNGKey(config.seed)
    n = config.measure_sample_n
    shape = (n, pipeline.sample_size, pipeline.sample_size, pipeline.in_channels)
    noise = jax.random.normal(rng, shape, jnp.float32)
    trigger = pipeline.encode(jnp.asarray(dsl.trigger)[None])
    backdoor_init = noise + trigger

    # sample caches keyed exactly like _score_key (sched/steps/epoch/clip):
    # re-measuring with a different sched, epoch snapshot, or clip setting
    # must not reuse another configuration's PNGs (VillanDiffusion.py:726-746)
    ep = config.sample_ep if config.sample_ep is not None else config.epoch
    tag = f"{config.sched}-{config.infer_steps}_ep{ep}"
    if config.clip is False:
        tag += "_noclip"
    clean_dir = os.path.join(config.output_dir, "measure", f"clean_{tag}")
    backdoor_dir = os.path.join(config.output_dir, "measure", f"backdoor_{tag}")
    steps = config.infer_steps
    mb = config.eval_max_batch

    clean_imgs = _batched_generate(pipeline, n, noise, steps, mb, clean_dir, rng)
    backdoor_imgs = _batched_generate(
        pipeline, n, backdoor_init, steps, mb, backdoor_dir, jax.random.fold_in(rng, 1)
    )

    fid_val = fid_from_arrays(dsl.images, clean_imgs, batch_size=min(mb, 256))

    # Offline FID calibration (VILLAN_FID_CONTROL=1): the random-init
    # InceptionV3 fallback yields tiny absolute FIDs, so also record the
    # regression-control scale (same-distribution floor vs deliberate
    # corruptions of THIS run's clean samples) — a run's FID carries signal
    # relative to these, not in absolute terms (eval/fid.py).
    control = None
    if os.environ.get("VILLAN_FID_CONTROL") == "1":
        from villandiffusion_tpu.eval.fid import fid_regression_control

        control = fid_regression_control(clean_imgs, batch_size=min(mb, 256))
        Log.info(f"fid regression control: {control}")

    # target mapped to [0,1] (VE: clamp; VP: x/2+0.5) VillanDiffusion.py:1078-1091
    target = np.asarray(dsl.target)
    if config.sde_type == S.SDE_VE:
        target01 = np.clip(target, 0.0, 1.0)
    else:
        target01 = np.clip(target / 2.0 + 0.5, 0.0, 1.0)
    target_rep = np.broadcast_to(target01, backdoor_imgs.shape)

    mse = Metric.mse_batch(backdoor_imgs, target_rep)
    mse_thres = Metric.mse_thres_batch(backdoor_imgs, target_rep, thres=0.1)
    ssim = Metric.ssim_batch(backdoor_imgs, target_rep, max_batch_n=min(mb, 256))

    ci_lo, ci_hi = Metric.wilson_ci(mse_thres, n)
    scores = {
        _score_key(config, "FID"): fid_val,
        _score_key(config, "MSE"): mse,
        _score_key(config, "MSE_THRES"): mse_thres,
        # binomial 95% CI + n for the attack-success proportion: point
        # estimates at a few hundred samples are +-several points of noise
        _score_key(config, "MSE_THRES_CI95"): [round(ci_lo, 5), round(ci_hi, 5)],
        _score_key(config, "MSE_THRES_N"): n,
        _score_key(config, "SSIM"): ssim,
    }
    if control is not None:
        scores[_score_key(config, "FID_CONTROL")] = control
    update_score_file(config, scores)
    MetricsLogger(config.output_dir).log(scores)
    Log.info(f"measure: {scores}")
    return scores


def train_loop(
    config: C.TrainingConfig,
    dsl: L.DatasetLoader,
    bundle: F.ModelBundle,
    start_epoch: int = 0,
) -> None:
    steps_per_epoch = max(dsl.num_batch, 1)
    trainer, mesh = make_trainer(config, bundle, steps_per_epoch)
    state = trainer.init_state(bundle.params)
    ckpt_mgr = CheckpointManager(config.ckpt_path)
    logger = MetricsLogger(
        config.output_dir, project=config.project,
        config=dataclasses.asdict(config),
    )
    rng = jax.random.PRNGKey(config.seed)

    if config.mode == C.MODE_RESUME:
        state, extra, step0 = ckpt_mgr.restore(state)
        start_epoch = int((extra or {}).get("epoch", 0)) + 1
        Log.info(f"resumed from step {step0}, starting epoch {start_epoch}")

    # Device-side poisoning for pixel-space training: ship uint8 pixels +
    # flags, materialize {target, pixel_values} inside the jitted step
    # (~10x less host->device traffic; essential on slow host links).
    use_raw = (
        trainer.vae is None
        and hasattr(dsl, "get_raw_dataloader")
        and dsl.trigger is not None
    )
    if use_raw:
        trainer.batch_transform = P.make_device_materializer(
            dsl.trigger, dsl.target, dsl.vmin, dsl.vmax
        )
    step_fn = trainer.make_step()

    def save_everything(epoch: int) -> None:
        # Fetch the whole state to host FIRST, on this thread, then hand orbax
        # numpy arrays and block until the save lands.  The async default
        # (orbax background thread pulling ~3.3 GB device->host while the main
        # thread starts the unet export's own transfer) deadlocked the
        # single-stream tunnel DETERMINISTICALLY at the first periodic save —
        # two 40-epoch LDM attempts hung at the same step.  Serial-and-hosted
        # costs ~1-2 min per save at the link's ~44 MB/s but cannot wedge;
        # the stage logs keep the log-silence watchdog (tools/tpu_guard.py)
        # from killing a healthy long save.
        step_now = int(state.step)
        Log.info(f"checkpoint: fetching state to host (step {step_now})")
        host_state = jax.tree.map(np.asarray, state)
        Log.info("checkpoint: orbax save start")
        ckpt_mgr.save(step_now, host_state, extra={"epoch": epoch})
        ckpt_mgr.wait()
        Log.info("checkpoint: orbax save done; writing unet export")
        save_model_dir(config.output_dir, bundle.model.config, host_state.params)
        Log.info("checkpoint: unet export done")
        vq_params_path = os.path.join(config.output_dir, "vqvae", "params.msgpack")
        if bundle.vae is not None and not (
            os.path.exists(vq_params_path) and os.path.getsize(vq_params_path) > 0
        ):
            # the reference persists the LDM vqvae/ next to unet/
            # (pipeline.save_pretrained, VillanDiffusion.py:1109) — without
            # it, resume/sampling on the run dir cannot rebuild the pipeline.
            # The VAE is frozen, so write it once: re-serializing 55-84M
            # params every save_model_epochs is pure wasted host IO.
            from villandiffusion_tpu.models.vae import save_vae_dir

            save_vae_dir(config.output_dir, bundle.vae)
        if config.is_save_all_model_epochs:
            ep_dir = os.path.join(config.output_dir, config.ep_model_dir, f"ep{epoch}")
            save_model_dir(ep_dir, bundle.model.config, host_state.params)

    def do_sampling(tag) -> None:
        pipe = bundle.make_pipeline(
            params=state.params, clip=config.clip, mesh=mesh,
            compute_dtype=_eval_dtype(config),
        )
        try:
            sampling(config, tag, pipe, dsl)
        except NotImplementedError as e:
            Log.warning(f"sampling skipped: {e}")

    # last fully completed epoch; the finally-save tags the checkpoint with
    # it so `--mode resume` redoes an interrupted epoch instead of computing
    # start_epoch past the end (reference: VillanDiffusion.py:455-462,1196)
    completed_epoch = start_epoch - 1
    try:
        if start_epoch == 0:
            do_sampling(0)
        for epoch in range(start_epoch, config.epoch):
            # accumulate the epoch-mean loss on device; fetching per step
            # would serialize dispatch on the host link round-trip
            loss_sum, n_steps = None, 0
            batches = (
                dsl.get_raw_dataloader(epoch_seed=epoch)
                if use_raw
                else dsl.get_dataloader(epoch_seed=epoch)
            )

            def host_stage(batch):
                # indexing/blit + host->device placement on the prefetch
                # thread, overlapped with the device's current step (the
                # reference's DataLoader workers, dataset.py:460-470)
                if use_raw:
                    return shard_batch(mesh, dict(batch))
                key = "image" if config.rm_backdoor else "target"
                return shard_batch(
                    mesh,
                    {
                        key: batch[L.IMAGE if config.rm_backdoor else L.TARGET],
                        "pixel_values": batch[L.PIXEL_VALUES],
                    },
                )

            for device_batch in prefetch(batches, transform=host_stage):
                state, loss = step_fn(state, device_batch, rng)
                loss_sum = loss if loss_sum is None else loss_sum + loss
                n_steps += 1
            completed_epoch = epoch
            if n_steps == 0:
                # dataset smaller than batch_size with drop_last: nothing ran
                Log.warning(f"epoch {epoch}: no batches (dataset < batch size)")
                continue
            mean_loss = float(loss_sum) / n_steps
            logger.log(
                {"loss": mean_loss, "epoch": epoch}, step=int(state.step)
            )
            Log.info(
                f"epoch {epoch}: loss {mean_loss:.5f} (step {int(state.step)})"
            )
            if (epoch + 1) % config.save_image_epochs == 0 or epoch == config.epoch - 1:
                do_sampling(epoch)
            if (epoch + 1) % config.save_model_epochs == 0 or epoch == config.epoch - 1:
                save_everything(epoch)
    except KeyboardInterrupt:
        Log.warning("interrupted; saving checkpoint")
        raise
    except Exception:
        Log.error(traceback.format_exc())
        raise
    finally:
        # error-resilient save (VillanDiffusion.py:1189-1199), tagged with the
        # epoch actually reached so resume continues from the right place
        save_everything(completed_epoch)
        ckpt_mgr.wait()
        do_sampling("final")
        logger.close()
    bundle.params = state.params


def _setup_runtime():
    from villandiffusion_tpu.utils.jaxruntime import (
        respect_jax_platforms_env,
        setup_jax_cache,
    )

    respect_jax_platforms_env()
    setup_jax_cache()


def main(argv=None) -> Dict:
    _setup_runtime()
    config = C.setup(argv)
    Log.info(f"MODE: {config.mode}; output: {config.output_dir}")
    dsl = get_data_loader(config)
    scores: Dict = {}

    # sampling/measure fan out over every chip (the reference's DataParallel
    # inference, VillanDiffusion.py:440): same mesh the trainer uses
    mesh = make_mesh()
    if config.mode in (C.MODE_TRAIN, C.MODE_RESUME, C.MODE_TRAIN_MEASURE):
        bundle = build_bundle(config, dsl, for_eval=False)
        train_loop(config, dsl, bundle)
        if config.mode == C.MODE_TRAIN_MEASURE:
            pipe = bundle.make_pipeline(
                clip=config.clip, mesh=mesh, compute_dtype=_eval_dtype(config)
            )
            scores = measure(config, dsl, pipe)
    elif config.mode == C.MODE_SAMPLING:
        bundle = build_bundle(config, dsl, for_eval=True)
        pipe = bundle.make_pipeline(
            clip=config.clip, ddim_eta=config.ddim_eta, mesh=mesh,
            compute_dtype=_eval_dtype(config),
        )
        sampling(config, "sampling", pipe, dsl)
    elif config.mode == C.MODE_MEASURE:
        bundle = build_bundle(config, dsl, for_eval=True)
        pipe = bundle.make_pipeline(
            clip=config.clip, ddim_eta=config.ddim_eta, mesh=mesh,
            compute_dtype=_eval_dtype(config),
        )
        scores = measure(config, dsl, pipe)
    else:
        raise NotImplementedError(config.mode)
    return scores


if __name__ == "__main__":
    main()
