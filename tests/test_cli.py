"""End-to-end CLI tests: train -> sampling -> measure -> resume on FAKE32."""

import json
import os

import numpy as np
import pytest

from villandiffusion_tpu import cli


COMMON = [
    "--dataset", "FAKE32",
    "--ckpt", "UNET-TINY-DEFAULT",
    "--trigger", "BOX_14",
    "--target", "CORNER",
    "--poison_rate", "0.5",
    "--epoch", "2",
    "--batch", "32",
    "--infer_steps", "5",
    "--eval_max_batch", "16",
    "--measure_sample_n", "16",
    "--eval_sample_n", "4",
    "--save_image_epochs", "2",
    "--save_model_epochs", "1",
]


@pytest.fixture(scope="module", autouse=True)
def small_fake_dataset():
    # 64 examples = 2 steps/epoch for every CLI run in this module: the e2e
    # contract under test (artifacts, naming, resume, measure keys) is
    # dataset-size independent, and the single-CPU box pays ~1.5 s/step
    old = os.environ.get("VILLAN_FAKE_N")
    os.environ["VILLAN_FAKE_N"] = "64"
    yield
    if old is None:
        os.environ.pop("VILLAN_FAKE_N", None)
    else:
        os.environ["VILLAN_FAKE_N"] = old


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory, small_fake_dataset):
    res = tmp_path_factory.mktemp("runs")
    cli.main(["--mode", "train"] + COMMON + ["--result", str(res), "--overwrite"])
    (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
    return os.path.join(str(res), out)


class TestTrain:
    def test_run_dir_artifacts(self, run_dir):
        assert os.path.exists(os.path.join(run_dir, "args.json"))
        assert os.path.exists(os.path.join(run_dir, "config.json"))
        assert os.path.exists(os.path.join(run_dir, "unet", "params.msgpack"))
        assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
        # epoch-0 grid + final grid, each with the movie's first-step frame
        # (reference artifact names: {epoch:04d}.png + ..._sample_t0.png)
        assert os.path.exists(os.path.join(run_dir, "samples", "0000.png"))
        assert os.path.exists(os.path.join(run_dir, "samples", "0000_sample_t0.png"))
        assert os.path.exists(os.path.join(run_dir, "samples", "final.png"))
        assert os.path.exists(os.path.join(run_dir, "samples", "final_sample_t0.png"))
        assert os.path.exists(os.path.join(run_dir, "backdoor_samples", "final.png"))

    def test_loss_logged(self, run_dir):
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert len(losses) == 2 and all(np.isfinite(losses))

    def test_naming_encodes_params(self, run_dir):
        name = os.path.basename(run_dir)
        assert "FAKE32" in name and "BOX_14-CORNER" in name and "p0.5" in name


class TestSampling:
    def test_sampling_mode(self, run_dir):
        cli.main(
            ["--mode", "sampling", "--ckpt", run_dir, "--sched", "DDIM-SCHED",
             "--infer_steps", "4"]
        )
        assert os.path.exists(os.path.join(run_dir, "samples", "sampling.png"))
        assert os.path.exists(os.path.join(run_dir, "sampling.json"))


class TestFSDPTrain:
    def test_train_with_fsdp_flag(self, tmp_path):
        """--fsdp trains end-to-end with params+opt state sharded over the
        8-virtual-device mesh (ZeRO-3 product path)."""
        res = tmp_path / "runs"
        cli.main(
            ["--mode", "train"] + COMMON + [
                "--epoch", "1", "--fsdp", "--result", str(res), "--overwrite",
            ]
        )
        (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
        with open(res / out / "metrics.jsonl") as f:
            recs = [json.loads(l) for l in f]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))


@pytest.mark.slow
class TestMeasure:
    def test_measure_mode_writes_scores(self, run_dir):
        scores = cli.main(
            ["--mode", "measure", "--ckpt", run_dir, "--sched", "DDIM-SCHED",
             "--infer_steps", "4"]
        )
        path = os.path.join(run_dir, "score.json")
        assert os.path.exists(path)
        with open(path) as f:
            data = json.load(f)
        # no _ep segment without --sample_ep (reference key grammar,
        # VillanDiffusion.py:728)
        assert any(k.startswith("FID_DDIM-SCHED") for k in data)
        assert any(k.startswith("MSE_DDIM-SCHED") for k in data)
        assert any(k.startswith("SSIM_DDIM-SCHED") for k in data)
        for v in scores.values():
            assert np.all(np.isfinite(v))  # MSE_THRES_CI95 is an [lo, hi] pair
        # attack-success CI + n ride alongside the point estimate
        (ci,) = [v for k, v in scores.items() if k.startswith("MSE_THRES_CI95")]
        (n,) = [v for k, v in scores.items() if k.startswith("MSE_THRES_N")]
        assert 0.0 <= ci[0] <= ci[1] <= 1.0 and n > 0

    def test_measure_fid_control_env_records_calibration(self, run_dir, monkeypatch):
        """VILLAN_FID_CONTROL=1 adds the offline-FID regression-control scale
        (floor vs corruption FIDs on this run's clean samples) to score.json."""
        monkeypatch.setenv("VILLAN_FID_CONTROL", "1")
        scores = cli.main(
            ["--mode", "measure", "--ckpt", run_dir, "--sched", "DDIM-SCHED",
             "--infer_steps", "4"]
        )
        (key,) = [k for k in scores if k.startswith("FID_CONTROL")]
        ctl = scores[key]
        assert set(ctl) >= {"floor", "noise", "blur", "collapse"}
        assert all(np.isfinite(v) for v in ctl.values())
        with open(os.path.join(run_dir, "score.json")) as f:
            assert key in json.load(f)

    def test_measure_resume_cache(self, run_dir):
        """PNG-count cache: re-measure skips generation (idempotent eval)."""
        clean_dir = os.path.join(run_dir, "measure", "clean_DDIM-SCHED-4_ep2")
        n_png = len(os.listdir(clean_dir))
        assert n_png == 16
        mtimes = {f: os.path.getmtime(os.path.join(clean_dir, f)) for f in os.listdir(clean_dir)}
        cli.main(
            ["--mode", "measure", "--ckpt", run_dir, "--sched", "DDIM-SCHED",
             "--infer_steps", "4"]
        )
        for f, t in mtimes.items():
            assert os.path.getmtime(os.path.join(clean_dir, f)) == t


class TestResume:
    def test_resume_continues(self, run_dir):
        cli.main(["--mode", "resume", "--ckpt", run_dir])
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        epochs = [r["epoch"] for r in recs if "epoch" in r]
        # initial train: epochs 0,1 — resume restores ep1 and exits (>= epoch)
        assert max(epochs) >= 1


@pytest.mark.slow
class TestResumeAfterInterrupt:
    def test_crash_mid_training_resumes_at_right_epoch(self, tmp_path, monkeypatch):
        """A crash during epoch 2 must checkpoint epoch=1 (last completed),
        so resume redoes epoch 2 and finishes — not compute start_epoch past
        the end and exit without training."""
        import villandiffusion_tpu.data.loader as DL

        # epoch-count semantics don't depend on dataset size: shrink to 64
        # examples (2 steps/epoch) so the two full CLI runs spend their time
        # in compiles, not steps
        monkeypatch.setenv("VILLAN_FAKE_N", "64")
        res = tmp_path / "runs"
        args = ["--mode", "train"] + COMMON + [
            "--epoch", "4", "--save_model_epochs", "10",
            "--save_image_epochs", "10",
            "--result", str(res), "--overwrite",
        ]
        orig = DL.DatasetLoader.get_raw_dataloader

        def boom(self, *a, epoch_seed=0, **kw):
            if epoch_seed == 2:
                raise RuntimeError("injected interrupt")
            return orig(self, *a, epoch_seed=epoch_seed, **kw)

        monkeypatch.setattr(DL.DatasetLoader, "get_raw_dataloader", boom)
        with pytest.raises(RuntimeError, match="injected interrupt"):
            cli.main(args)
        monkeypatch.setattr(DL.DatasetLoader, "get_raw_dataloader", orig)

        (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
        run_dir = os.path.join(str(res), out)
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            epochs_before = {
                json.loads(l)["epoch"] for l in f if "epoch" in json.loads(l)
            }
        assert epochs_before == {0, 1}

        cli.main(["--mode", "resume", "--ckpt", run_dir])
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            epochs_after = {
                json.loads(l)["epoch"] for l in f if "epoch" in json.loads(l)
            }
        # resume restarted at the interrupted epoch (2) and ran to the end
        assert epochs_after == {0, 1, 2, 3}


class TestConfigGuards:
    def test_existing_dir_without_overwrite_raises(self, run_dir, tmp_path):
        res = os.path.dirname(run_dir)
        with pytest.raises(ValueError, match="already exists"):
            cli.main(["--mode", "train"] + COMMON + ["--result", res])

    def test_invalid_flag_for_mode(self, run_dir):
        with pytest.raises(NotImplementedError, match="isn't used in mode"):
            cli.main(
                ["--mode", "sampling", "--ckpt", run_dir, "--poison_rate", "0.9"]
            )


class TestInpaintScoringTargets:
    """Poisoned inpaint/denoise tasks score recovery against the range-mapped
    BACKDOOR TARGET (the attack measurement), unpoisoned tasks against the
    clean originals (/root/reference/VillanDiffusion.py:917-918,930-945)."""

    class _StubPipe:
        """Identity 'recovery': returns a constant known image batch."""

        def __init__(self, out01):
            self.out01 = out01

        def encode(self, x):
            return x

        def __call__(self, init, num_inference_steps, start_from, rng):
            import types

            n = init.shape[0]
            return types.SimpleNamespace(
                images=np.repeat(self.out01[None], n, axis=0)
            )

    def _run(self, task, tmp_path):
        from villandiffusion_tpu import config as C
        from villandiffusion_tpu.cli import get_data_loader, measure_inpaint

        cfg = C.TrainingConfig(
            dataset="FAKE32", trigger="BOX_14", target="CORNER",
            poison_rate=0.5, task=task, infer_steps=2, infer_start=1,
            measure_inpaint_sample_n=8, eval_max_batch=8,
            output_dir=str(tmp_path / task), sched="DDIM-SCHED",
            clip=True, seed=0,
        )
        os.makedirs(cfg.output_dir, exist_ok=True)
        dsl = get_data_loader(cfg)
        out01 = np.full((32, 32, 3), 0.25, np.float32)
        scores = measure_inpaint(cfg, dsl, self._StubPipe(out01))
        mse = next(v for k, v in scores.items() if k.startswith("MSE"))
        return cfg, dsl, out01, mse

    def test_poisoned_task_scores_vs_backdoor_target(self, tmp_path):
        cfg, dsl, out01, mse = self._run("poisoned_denoise", tmp_path)
        target01 = np.clip(np.asarray(dsl.target) / 2.0 + 0.5, 0.0, 1.0)
        expect = float(np.mean((out01 - target01) ** 2))
        assert mse == pytest.approx(expect, rel=1e-5)

    def test_unpoisoned_task_scores_vs_clean_originals(self, tmp_path):
        cfg, dsl, out01, mse = self._run("unpoisoned_denoise", tmp_path)
        n = cfg.measure_inpaint_sample_n
        import numpy as _np

        tail = dsl.get_batch(_np.arange(len(dsl) - n, len(dsl)))
        orig01 = np.clip(np.asarray(tail["image"]) / 2.0 + 0.5, 0.0, 1.0)
        expect = float(np.mean((out01[None] - orig01) ** 2))
        assert mse == pytest.approx(expect, rel=1e-4)


class TestEvalDtypePolicy:
    """Sampling/measure pipelines follow the train-time AMP policy: bf16 for
    VP/LDM, fp32 for VE (config.py derives it as VillanDiffusion.py:260-264
    picks fp16/no) — the eval path must not silently fall back to fp32, which
    halves MXU throughput on every BASELINE.md sampling row."""

    def test_policy(self):
        import jax.numpy as jnp

        from villandiffusion_tpu import config as C

        cfg = C.TrainingConfig()
        cfg.mixed_precision = "bf16"
        assert cli._eval_dtype(cfg) == jnp.bfloat16
        cfg.mixed_precision = "no"
        assert cli._eval_dtype(cfg) is None


class TestScoreKeyGrammar:
    """score.json key grammar must match the reference exactly
    (/root/reference/VillanDiffusion.py:726-746): generate-task keys end in
    _{measure_sample_n}; inpaint/denoise keys end in
    _{measure_inpaint_sample_n}_{task}; DDIM with a non-default eta appends
    -eta{η} to the sched segment."""

    def _cfg(self, **kw):
        from villandiffusion_tpu import config as C

        kw.setdefault("clip", True)
        cfg = C.TrainingConfig(
            epoch=50, sched="DDIM-SCHED", infer_steps=50,
            measure_sample_n=10000, measure_inpaint_sample_n=1024, **kw
        )
        return cfg

    def test_generate_key_no_ep_segment_by_default(self):
        # reference: the _ep segment appears ONLY when sample_ep is set
        # (VillanDiffusion.py:728), so a default measure run's keys are
        # byte-identical to the reference's
        assert cli._score_key(self._cfg(), "FID") == "FID_DDIM-SCHED-50_10000"

    def test_inpaint_key_appends_task_and_inpaint_n(self):
        cfg = self._cfg(task="poisoned_denoise")
        assert (cli._score_key(cfg, "MSE")
                == "MSE_DDIM-SCHED-50_1024_poisoned_denoise")

    def test_noclip_and_eta(self):
        cfg = self._cfg(clip=False, ddim_eta=0.5)
        assert (cli._score_key(cfg, "MSE")
                == "MSE_noclip_DDIM-SCHED-50-eta0.5_10000")

    def test_sample_ep_adds_ep_segment(self):
        cfg = self._cfg(sample_ep=7)
        assert cli._score_key(cfg, "SSIM") == "SSIM_ep7_DDIM-SCHED-50_10000"


class TestVESigmaMaxPersistence:
    """A VE run trained under $VILLAN_VE_SIGMA_MAX must measure/resume on
    the SAME ladder: the effective sigma_max is persisted to args.json at
    train time and read back in measure/resume modes, where a stale env var
    must not override it (a sigma<=25-trained model silently re-measured on
    the default 380-sigma ladder produces garbage scores)."""

    def test_env_seeds_train_and_args_json_wins_at_measure(
        self, tmp_path, monkeypatch
    ):
        from villandiffusion_tpu import config as C, factory as F

        monkeypatch.setenv("VILLAN_VE_SIGMA_MAX", "25")
        cfg = C.setup([
            "--mode", "train", "--dataset", "FAKE32", "--sde_type", "SDE-VE",
            "--ckpt", "NCSN-TINY-DEFAULT", "--epoch", "1",
            "--result", str(tmp_path), "--overwrite",
        ])
        assert cfg.ve_sigma_max == 25.0
        with open(os.path.join(cfg.output_dir, "args.json")) as f:
            assert json.load(f)["ve_sigma_max"] == 25.0

        monkeypatch.delenv("VILLAN_VE_SIGMA_MAX")
        cfg2 = C.setup(["--mode", "measure", "--ckpt", cfg.output_dir])
        assert cfg2.ve_sigma_max == 25.0
        bundle = F.get_model_sched(
            image_size=32, channels=3, ckpt="NCSN-TINY-DEFAULT",
            sde_type="SDE-VE", ve_sigma_max=cfg2.ve_sigma_max,
        )
        assert abs(float(bundle.schedule.sigma_max) - 25.0) < 1e-6

        monkeypatch.setenv("VILLAN_VE_SIGMA_MAX", "99")
        cfg3 = C.setup(["--mode", "measure", "--ckpt", cfg.output_dir])
        assert cfg3.ve_sigma_max == 25.0
