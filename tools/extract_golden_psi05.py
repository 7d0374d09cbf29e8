"""Extract the psi=0.5 VP (TrojDiff-blend) R-ladder golden from the
reference implementation.

Executes /root/reference/loss.py's own ``get_hs_vp`` + ``get_R_coef_gen_vp``
on torch CPU (fp32, same harness as the existing goldens in
tests/golden/ref_vp_r_ladders.npz) at psi=0.5 — the one branch of the
paper's core math that was previously only tested for blend linearity —
and appends ``vp_{step,coef}_psi05_{sde,ode}`` keys to the npz.

Run: python tools/extract_golden_psi05.py
"""

import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "ref_vp_r_ladders.npz"
)


def import_reference_loss():
    """Import the reference's loss.py with its intra-repo imports stubbed
    (dataset/model pull in torchvision + diffusers, which this extraction
    doesn't need — only the pure ladder math runs)."""
    ds = types.ModuleType("dataset")
    ds.Backdoor = object
    ds.DEFAULT_VMIN = -1.0
    ds.DEFAULT_VMAX = 1.0

    md = types.ModuleType("model")

    class _Sched:
        SDE_VP = "SDE-VP"
        SDE_VE = "SDE-VE"
        SDE_LDM = "SDE-LDM"

    md.DiffuserModelSched = _Sched

    sys.modules.setdefault("dataset", ds)
    sys.modules.setdefault("model", md)

    import matplotlib

    matplotlib.use("Agg")

    sys.path.insert(0, REF)
    import loss as ref_loss  # noqa: E402

    return ref_loss


def main() -> None:
    ref_loss = import_reference_loss()

    # default linear-beta DDPM ladder, T=1000, fp32 (matches the existing
    # vp_* golden extraction and VPSchedule.create defaults)
    T = 1000
    betas = torch.linspace(1e-4, 0.02, T, dtype=torch.float32)
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)
    hs = ref_loss.get_hs_vp(alphas=alphas, alphas_cumprod=ac)

    out = {}
    for st in ("sde", "ode"):
        step, coef = ref_loss.get_R_coef_gen_vp(
            alphas_cumprod=ac, alphas=alphas, hs=hs,
            psi=0.5, solver_type=st, vp_scale=1.0, ve_scale=1.0,
        )
        out[f"vp_step_psi05_{st}"] = step.numpy().astype(np.float32)
        out[f"vp_coef_psi05_{st}"] = coef.numpy().astype(np.float32)

    existing = dict(np.load(GOLDEN))
    existing.update(out)
    np.savez(GOLDEN, **existing)
    for k, v in out.items():
        print(k, v.shape, v[:3], "...", v[-3:])


if __name__ == "__main__":
    main()
