"""MetricsLogger tracker fan-out (reference surface:
accelerate(log_with=["tensorboard","wandb"]),
/root/reference/VillanDiffusion.py:356-367)."""

import json
import os

from villandiffusion_tpu.utils.log import MetricsLogger


def test_jsonl_always_written(tmp_path):
    lg = MetricsLogger(str(tmp_path), trackers=[])
    lg.log({"loss": 0.5, "epoch": 0}, step=1)
    lg.close()
    recs = [
        json.loads(line)
        for line in open(tmp_path / "metrics.jsonl")
    ]
    assert recs[0]["loss"] == 0.5 and recs[0]["_step"] == 1


def test_tensorboard_tracker_writes_events(tmp_path):
    lg = MetricsLogger(str(tmp_path), trackers=["tensorboard"])
    assert len(lg._trackers) == 1, "tensorboard backend should init (torch baked in)"
    lg.log({"loss": 0.25, "note": "not-a-scalar"}, step=3)
    lg.close()
    tb_dir = tmp_path / "tb"
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, f"no event files in {tb_dir}"
    assert (tb_dir / events[0]).stat().st_size > 0


def test_unavailable_tracker_degrades_to_jsonl(tmp_path):
    # wandb is not installed in this image: must warn and keep logging
    lg = MetricsLogger(str(tmp_path), trackers=["wandb", "no-such-backend"])
    assert lg._trackers == []
    lg.log({"loss": 1.0})
    lg.close()
    assert (tmp_path / "metrics.jsonl").exists()


def test_env_var_opt_in(tmp_path, monkeypatch):
    monkeypatch.setenv("VILLAN_TRACKERS", "tensorboard")
    lg = MetricsLogger(str(tmp_path))
    assert len(lg._trackers) == 1
    lg.close()
