"""Bitrot protection for the absolute-parity closure harness
(tools/parity_full.py — VERDICT r4 ask #4).

The harness is the one tool meant to close the env-blocked parity rows
(BASELINE.md "To be measured") the day reference assets are mounted; it is
otherwise never imported, so these fast-tier tests pin its two contracts:

1. ``--audit`` on an empty environment reports every canonical config as
   blocked with the concrete missing asset paths,
2. ``compare()`` applies the BASELINE.json acceptance rule (|FID-ref|/ref
   <= 2%, |MSE-ref| <= 1e-3) against real product score keys, including
   the FID_CONTROL / MSE_THRES[/_CI95/_N] exclusions of the key grammar.

Reference protocol: /root/reference/VillanDiffusion.py:1050-1091,
fid_score.py:266-285.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pf():
    spec = importlib.util.spec_from_file_location(
        "parity_full", os.path.join(REPO, "tools", "parity_full.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestAudit:
    def test_empty_env_blocks_every_config_with_missing_paths(self, pf, tmp_path):
        import argparse

        a = argparse.Namespace(pretrained_root=str(tmp_path / "pre"),
                               data_root=str(tmp_path / "data"))
        report = pf.audit(a)
        # all five canonical families are present and blocked
        assert set(report) == {"cifar10_vp", "celeba_hq_vp", "ncsn_ve",
                               "ldm", "sd_conditional"}
        for name, row in report.items():
            assert row["runnable"] is False, name
            assert row["missing"], name
            # every blocker is a concrete path under the given roots
            for p in row["missing"]:
                assert p.startswith(str(tmp_path)), p

    def test_mounting_assets_flips_runnable(self, pf, tmp_path):
        import argparse

        pre, data = tmp_path / "pre", tmp_path / "data"
        for rel in ("google/ddpm-cifar10-32/unet",):
            (pre / rel).mkdir(parents=True)
        (pre / "pt_inception-2015-12-05.pth").write_bytes(b"x")
        (data / "cifar10").mkdir(parents=True)
        a = argparse.Namespace(pretrained_root=str(pre), data_root=str(data))
        report = pf.audit(a)
        assert report["cifar10_vp"]["runnable"] is True
        assert report["ldm"]["runnable"] is False  # still blocked

    def test_cli_audit_mode_prints_report_and_exits_zero(self, tmp_path):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "parity_full.py"),
             "--audit", "--pretrained_root", str(tmp_path / "nope"),
             "--data_root", str(tmp_path / "nope2")],
            capture_output=True, text=True, timeout=120,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0, out.stderr
        report = json.loads(out.stdout)
        assert all(not row["runnable"] for row in report.values())


# product score keys exactly as cli._score_key emits them (incl. the
# FID_CONTROL calibration dict and the MSE_THRES CI companions)
def _scores(fid, mse):
    return {
        "FID_DDPM-SCHED-1000_10000": fid,
        "FID_CONTROL_DDPM-SCHED-1000_10000": {"floor": 1e-8},
        "MSE_DDPM-SCHED-1000_10000": mse,
        "MSE_THRES_DDPM-SCHED-1000_10000": 0.81,
        "MSE_THRES_CI95_DDPM-SCHED-1000_10000": [0.79, 0.84],
        "MSE_THRES_N_DDPM-SCHED-1000_10000": 10000,
        "SSIM_DDPM-SCHED-1000_10000": 0.05,
    }


class TestCompare:
    def test_pass_inside_both_tolerances(self, pf):
        ref = {"FID": 10.0, "MSE": 0.0930}
        out = pf.compare(_scores(fid=10.19, mse=0.0938), ref)
        assert out["fid"]["pass"] and out["mse"]["pass"]
        assert out["fid"]["got"] == 10.19  # picked FID_, not FID_CONTROL_

    def test_fid_fails_just_over_2_percent(self, pf):
        ref = {"FID": 10.0, "MSE": 0.0930}
        out = pf.compare(_scores(fid=10.21, mse=0.0930), ref)
        assert not out["fid"]["pass"]
        assert out["mse"]["pass"]

    def test_mse_fails_just_over_1e3_absolute(self, pf):
        ref = {"FID": 10.0, "MSE": 0.0930}
        out = pf.compare(_scores(fid=10.0, mse=0.09401), ref)
        assert out["fid"]["pass"]
        assert not out["mse"]["pass"]

    def test_mse_thres_and_fid_control_never_selected(self, pf):
        # make MSE_THRES/FID_CONTROL the alphabetically/insertion first keys:
        # compare must still score FID_/MSE_ proper
        scores = {
            "FID_CONTROL_DDPM-SCHED-1000_10000": {"floor": 1e-8},
            "MSE_THRES_DDPM-SCHED-1000_10000": 0.99,
            "MSE_THRES_CI95_DDPM-SCHED-1000_10000": [0.98, 1.0],
            "MSE_THRES_N_DDPM-SCHED-1000_10000": 256,
            "FID_DDPM-SCHED-1000_10000": 10.0,
            "MSE_DDPM-SCHED-1000_10000": 0.0930,
        }
        out = pf.compare(scores, {"FID": 10.0, "MSE": 0.0930})
        assert out["fid"]["got"] == 10.0
        assert out["mse"]["got"] == 0.0930
        assert out["fid"]["pass"] and out["mse"]["pass"]

    def test_missing_ref_fields_yield_empty_comparison(self, pf):
        assert pf.compare(_scores(10.0, 0.09), {}) == {}
