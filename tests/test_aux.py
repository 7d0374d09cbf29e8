"""Aux subsystem tests: sweep driver, memory logging, hub export, LPIPS,
inpaint measurement."""

import json
import os

import numpy as np
import pytest


class TestSweep:
    def test_expand_grid(self):
        from villandiffusion_tpu.utils.sweep import expand_grid

        pts = expand_grid({"a": [1, 2], "b": "x", "c": [True]})
        assert len(pts) == 2
        assert pts[0] == {"a": 1, "b": "x", "c": True}

    def test_dry_run_builds_commands(self, tmp_path):
        from villandiffusion_tpu.utils.sweep import run_sweep

        res = run_sweep(
            {"mode": "train", "poison_rate": [0.1, 0.2], "overwrite": True},
            dry_run=True,
            log_dir=str(tmp_path),
        )
        assert len(res) == 2
        cmd = res[0]["cmd"]
        assert "--mode" in cmd and "train" in cmd
        assert "--overwrite" in cmd
        assert "--poison_rate" in cmd

    def test_real_subprocess_roundtrip(self, tmp_path):
        from villandiffusion_tpu.utils.sweep import run_sweep

        # trivial module: python -m json.tool needs stdin; use a no-op module
        res = run_sweep(
            {"version": True},
            module="pip",
            log_dir=str(tmp_path),
        )
        assert res[0]["status"] == "ok"
        assert os.path.exists(tmp_path / "sweep_results.json")


class TestMeminfo:
    def test_host_and_device_stats(self):
        from villandiffusion_tpu.utils.meminfo import (
            device_memory_stats,
            host_memory_mb,
        )

        assert host_memory_mb() > 10.0
        stats = device_memory_stats()
        assert isinstance(stats, dict)

    def test_memory_log_and_trace(self, tmp_path, capsys):
        from villandiffusion_tpu.utils.meminfo import MemoryLog, trace_epoch

        log = MemoryLog(str(tmp_path / "memlog.log"))
        line = log.append("test")
        assert "host_rss=" in line
        with trace_epoch("ep0"):
            pass
        out = capsys.readouterr().out
        assert "[ep0]" in out


class TestHub:
    def test_export_archive(self, tmp_path):
        from villandiffusion_tpu.io.hub import export_archive

        run = tmp_path / "run"
        (run / "unet").mkdir(parents=True)
        (run / "unet" / "params.msgpack").write_bytes(b"x")
        (run / "score.json").write_text("{}")
        (run / "junk.bin").write_bytes(b"y")
        out = export_archive(str(run))
        import tarfile

        with tarfile.open(out) as tar:
            names = tar.getnames()
        assert any("params.msgpack" in n for n in names)
        assert any("score.json" in n for n in names)
        assert not any("junk.bin" in n for n in names)


class TestLPIPS:
    def test_identical_is_zero(self):
        from villandiffusion_tpu.eval.lpips import lpips_batch

        rng = np.random.default_rng(0)
        a = rng.random((2, 32, 32, 3)).astype(np.float32)
        assert lpips_batch(a, a) == pytest.approx(0.0, abs=1e-6)

    def test_discriminates(self):
        from villandiffusion_tpu.eval.lpips import lpips_batch

        rng = np.random.default_rng(0)
        a = rng.random((2, 32, 32, 3)).astype(np.float32)
        near = np.clip(a + rng.normal(0, 0.01, a.shape).astype(np.float32), 0, 1)
        far = rng.random((2, 32, 32, 3)).astype(np.float32)
        assert lpips_batch(a, near) < lpips_batch(a, far)


class TestArgParser:
    def test_declarative_flags_and_merge(self, tmp_path):
        import dataclasses
        from villandiffusion_tpu.utils.arg_parser import ArgParser, arg

        @dataclasses.dataclass
        class Cfg:
            steps: int = arg(25, help="inference steps")
            sched: str = arg("UNIPC-SCHED", choices=["UNIPC-SCHED", "DDIM-SCHED"])
            flag: bool = arg(False)
            hidden: int = dataclasses.field(default=7)  # not exported

        ap = ArgParser(Cfg)
        # defaults
        c = ap.parse(Cfg, argv=[])
        assert c.steps == 25 and c.sched == "UNIPC-SCHED" and not c.flag
        # CLI beats defaults
        c = ap.parse(Cfg, argv=["--steps", "50", "--flag"])
        assert c.steps == 50 and c.flag
        # saved json in the middle of the layering
        saved = tmp_path / "args.json"
        ap.save(Cfg(steps=99, sched="DDIM-SCHED"), str(saved))
        c = ap.parse(Cfg, argv=["--steps", "10"], saved_json=str(saved))
        assert c.steps == 10          # CLI wins
        assert c.sched == "DDIM-SCHED"  # saved wins over default
        # roundtrip load
        c2 = ArgParser.load(Cfg, str(saved))
        assert c2.steps == 99


def test_sweep_cli_dry_run(tmp_path):
    from villandiffusion_tpu.utils.sweep import main

    results = main([
        "--grid", "cifar10", "--dry_run", "--log_dir", str(tmp_path),
        "--set", "epoch=1", "poison_rate=[0.1]",
    ])
    assert len(results) == 1
    assert "--epoch" in results[0]["cmd"]


def test_latent_builder_cli(tmp_path, monkeypatch):
    import villandiffusion_tpu.models.vae as V
    from villandiffusion_tpu.data import latent as LT

    monkeypatch.setattr(
        V, "load_vae_for",
        lambda ckpt: V.make_random_vq(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=3,
            num_vq_embeddings=16,
        ),
    )
    out = str(tmp_path / "lat")
    LT.main([
        "--dataset", "FAKE32", "--ckpt", "ANY", "--out", out,
        "--image_size", "16", "--batch_size", "4", "--limit", "8",
        "--triggers", "BOX_14", "--targets", "CORNER",
    ])
    ds = LT.LatentDataset(out).set_poison("BOX_14", "CORNER", poison_rate=0.5)
    batch = next(iter(ds.get_dataloader(batch_size=4)))
    assert batch["image"].shape[0] == 4
