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
    "--num_fake", "8",
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
        CC.main(
            ["--mode", "sampling"] + COMMON + ["--output_dir", run_dir]
        )
        assert os.path.exists(os.path.join(run_dir, "samples", "clean.png"))
        assert os.path.exists(os.path.join(run_dir, "samples", "backdoor.png"))

    def test_measure(self, run_dir):
        scores = CC.main(
            ["--mode", "measure"] + COMMON + ["--output_dir", run_dir]
        )
        assert any(k.startswith("MSE_in_") for k in scores)
        assert any(k.startswith("FID_in_full_clean") for k in scores)
        assert all(np.isfinite(v) for v in scores.values())
        with open(os.path.join(run_dir, "score.json")) as f:
            data = json.load(f)
        assert set(scores).issubset(data)

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
