"""End-to-end conditional CLI: LoRA train -> sampling -> measure ->
caption_sim on the tiny SD stack."""

import json
import os

import numpy as np
import pytest

from villandiffusion_tpu import cli_conditional as CC

COMMON = [
    "--pretrained_model_name_or_path", "TINY",
    "--dataset_name", "FAKE-CAPTION",
    "--resolution", "16",
    "--caption_trigger", "TRIGGER_SKS",
    "--target", "CORNER",
    "--poison_rate", "0.5",
    "--lora_r", "2",
    "--train_batch_size", "4",
    "--max_train_steps", "6",
    "--checkpointing_steps", "4",
    "--num_inference_steps", "3",
    "--max_measure_samples", "4",
    # 20 captions -> TRAIN=18 / TEST=2 under test_ratio 0.1, so every
    # sampling part below can fill its 2-prompt grids
    "--num_fake", "20",
    "--seed", "0",
]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    res = str(tmp_path_factory.mktemp("cond"))
    CC.main(["--mode", "train"] + COMMON + ["--result_dir", res])
    (out,) = os.listdir(res)
    return os.path.join(res, out)


class TestConditionalCLI:
    def test_train_loss_finite(self, run_dir):
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses)), losses

    def test_train_artifacts(self, run_dir):
        assert os.path.exists(os.path.join(run_dir, "lora_weights.npz"))
        assert os.path.exists(os.path.join(run_dir, "lora_4", "lora_weights.npz"))
        assert os.path.exists(os.path.join(run_dir, "args.json"))
        flat = dict(np.load(os.path.join(run_dir, "lora_weights.npz")))
        assert all("lora" in k for k in flat)
        assert len(flat) > 0

    def test_sampling(self, run_dir):
        """Reference sampling surface (sampling.py:12-96): parts matrix
        grids with grid-size / prompt-count / trigger-position controls."""
        CC.main(
            ["--mode", "sampling"] + COMMON + [
                "--output_dir", run_dir,
                "--img_num_per_grid_sample", "2",
                "--sample_prompts_n", "2",
                "--trig_start_pos", "-2", "--trig_end_pos", "-1",
            ]
        )
        base = os.path.join(run_dir, "samples")
        for part in ("in_train", "in_test", "out_full"):
            for kind in ("clean", "caption_backdoor"):
                d = os.path.join(base, f"{part}_{kind}_step3_n2")
                assert sorted(os.listdir(d)) == ["grid_0.png", "grid_1.png"], d

    def test_sampling_clean_backdoor_switch_and_resume(self, run_dir):
        base = os.path.join(run_dir, "samples")
        d = os.path.join(base, "in_train_clean_step3_n2")
        mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
        # 'c' re-runs only clean parts; existing grids are kept (resume)
        CC.main(
            ["--mode", "sampling"] + COMMON + [
                "--output_dir", run_dir, "--clean_backdoor", "c",
                "--img_num_per_grid_sample", "2", "--sample_prompts_n", "2",
            ]
        )
        for f, t in mtimes.items():
            assert os.path.getmtime(os.path.join(d, f)) == t

    def test_sampling_ckpt_step(self, run_dir):
        """--ckpt_step loads lora_<step>/ snapshots; a bad step raises."""
        CC.main(
            ["--mode", "sampling"] + COMMON + [
                "--output_dir", run_dir, "--ckpt_step", "4",
                "--clean_backdoor", "b",
                "--img_num_per_grid_sample", "1", "--sample_prompts_n", "1",
                "--force_regenerate",
            ]
        )
        with pytest.raises(FileNotFoundError, match="ckpt_step"):
            CC.main(
                ["--mode", "sampling"] + COMMON + [
                    "--output_dir", run_dir, "--ckpt_step", "999",
                ]
            )

    @pytest.mark.slow  # ~50 s e2e cycle; keeps the fast gate under 8 min
    def test_resume_restores_full_train_state(self, tmp_path):
        """--resume_from_checkpoint latest restores params + optimizer state
        + step from the orbax checkpoint (the reference's
        accelerator.save_state contract) and continues to max_train_steps."""
        from villandiffusion_tpu.io.checkpoint import CheckpointManager

        res = str(tmp_path / "cond")
        args = [a for a in COMMON]
        args[args.index("--max_train_steps") + 1] = "4"
        args[args.index("--checkpointing_steps") + 1] = "2"
        CC.main(["--mode", "train"] + args + ["--result_dir", res])
        (out,) = os.listdir(res)
        run = os.path.join(res, out)
        assert CheckpointManager(os.path.join(run, "ckpt")).latest_step() == 4

        args[args.index("--max_train_steps") + 1] = "6"
        CC.main(
            ["--mode", "train"] + args + [
                "--output_dir", run, "--resume_from_checkpoint", "latest",
            ]
        )
        # resumed from step 4 -> trained 5,6 -> checkpointed at 6
        assert CheckpointManager(os.path.join(run, "ckpt")).latest_step() == 6
        assert os.path.exists(os.path.join(run, "lora_6", "lora_weights.npz"))
        # steps 1-4 were NOT redone: their snapshots are from the first run
        assert os.path.exists(os.path.join(run, "lora_2", "lora_weights.npz"))

    def test_eval_modes_merge_saved_train_args(self, run_dir):
        """sampling/measure need only the run dir: every unspecified flag
        adopts the train run's args.json (CLI > saved > defaults, reference
        measure.py:47-74), and the train record is never overwritten."""
        with open(os.path.join(run_dir, "args.json")) as f:
            before = f.read()
        CC.main([
            "--mode", "sampling", "--output_dir", run_dir,
            "--img_num_per_grid_sample", "1", "--sample_prompts_n", "1",
            "--clean_backdoor", "c", "--force_regenerate",
        ])
        with open(os.path.join(run_dir, "args.json")) as f:
            assert f.read() == before  # train record untouched
        with open(os.path.join(run_dir, "sampling.json")) as f:
            cfg = json.load(f)
        # merged from the train args (not the parser defaults)
        assert cfg["num_fake"] == 20 and cfg["resolution"] == 16
        assert cfg["caption_trigger"] == "TRIGGER_SKS"
        # explicit CLI flags win
        assert cfg["img_num_per_grid_sample"] == 1
        d = os.path.join(run_dir, "samples", "in_train_clean_step3_n1")
        assert os.path.exists(os.path.join(d, "grid_0.png"))

    def test_sampling_image_backdoor_kind(self, run_dir):
        """With an image trigger and no caption trigger, backdoor grids
        sample from encode(noise + trigger) and land in image_backdoor
        dirs (reference operate.py:150-156,230-240)."""
        args = [a for a in COMMON]
        args[args.index("TRIGGER_SKS")] = "NONE"
        CC.main(
            ["--mode", "sampling"] + args + [
                "--output_dir", run_dir, "--trigger", "BOX_14",
                "--clean_backdoor", "b",
                "--img_num_per_grid_sample", "1", "--sample_prompts_n", "1",
            ]
        )
        d = os.path.join(run_dir, "samples", "in_train_image_backdoor_step3_n1")
        assert os.listdir(d) == ["grid_0.png"]

    @pytest.mark.slow
    def test_measure(self, run_dir):
        scores = CC.main(
            ["--mode", "measure"] + COMMON + ["--output_dir", run_dir]
        )
        assert any(k.startswith("MSE_in_") for k in scores)
        assert any(k.startswith("FID_in_full_clean") for k in scores)
        # OUT-dist half of the measure matrix (reference measure.py:60-65):
        # prompts from the "other" dataset (FAKE-CAPTION self-maps offline)
        assert any(k.startswith("MSE_out_train_backdoor") for k in scores)
        assert any(k.startswith("MSE_out_test_backdoor") for k in scores)
        assert all(np.isfinite(v) for v in scores.values())
        with open(os.path.join(run_dir, "score.json")) as f:
            data = json.load(f)
        assert set(scores).issubset(data)

    @pytest.mark.slow
    def test_measure_resume_cache(self, run_dir):
        d = os.path.join(run_dir, "measure", "in_train_clean")
        mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
        CC.main(["--mode", "measure"] + COMMON + ["--output_dir", run_dir])
        for f, t in mtimes.items():
            assert os.path.getmtime(os.path.join(d, f)) == t

    def test_caption_sim(self, run_dir):
        scores = CC.main(
            ["--mode", "caption_sim"] + COMMON + ["--output_dir", run_dir]
        )
        assert -1.0 <= scores["caption_similarity"] <= 1.0


class TestMidStackAndBackboneInit:
    """MID stack (real SD v1 block topology at reduced widths) and
    --unet_init_from (pretrained-backbone init for LoRA-only implanting,
    tools/parity_cond_lora.py)."""

    @pytest.mark.slow  # heaviest fast-tier item (builds the full MID stack);
    # moved to the slow tier to keep the fast gate under its 8-min budget
    # (VERDICT r3 ask #9)
    def test_mid_stack_shapes(self):
        import argparse

        from villandiffusion_tpu import cli_conditional as CC

        ns = argparse.Namespace(
            pretrained_model_name_or_path="MID", resolution=64,
            lora_r=4, use_lora=True, seed=0,
        )
        stack = CC.build_stack(ns)
        assert stack.latent_size == 16 and stack.image_size == 64
        cfg = stack.unet.config
        assert cfg.down_block_types == (
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D", "DownBlock2D")
        assert cfg.layers_per_block == 2 and cfg.lora_rank == 4

    def test_unet_init_from_restores_backbone(self, tmp_path):
        import argparse

        import jax
        import numpy as np

        from villandiffusion_tpu import cli_conditional as CC

        ns = argparse.Namespace(
            pretrained_model_name_or_path="TINY", resolution=16,
            lora_r=2, use_lora=True, seed=0,
        )
        stack = CC.build_stack(ns)
        # fake a full-finetune donor: perturb every leaf and save full
        donor = jax.tree.map(lambda a: a + 1.0, stack.params)
        CC.save_lora(str(tmp_path), donor, full=True)
        merged = CC.load_lora(str(tmp_path), stack.params)
        for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(donor)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
