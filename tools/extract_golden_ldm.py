"""Extract the LDM (scaled-linear beta) R-ladder golden from the reference.

The LDM family rides the reference's VP ladder functions (loss.py:593,715 —
SDE_LDM and SDE_VP share every branch) but over the CompVis scheduler's
scaled-linear betas (beta_start=0.0015, beta_end=0.0195, T=1000 —
/root/reference/model.py:714-717).  The existing goldens pin the linear-beta
DDPM ladder only; this appends ``ldm_{step,coef}_{sde,ode}`` keys so the
latent-backdoor coefficients trained by runs/parity_ldm are pinned against
the reference's own code at the LDM betas, not just at the DDPM betas.

Run: python tools/extract_golden_ldm.py
(same torch-CPU harness as tools/extract_golden_psi05.py)
"""

import os

import numpy as np
import torch

from extract_golden_psi05 import GOLDEN, import_reference_loss


def main() -> None:
    ref_loss = import_reference_loss()

    # diffusers "scaled_linear": linspace in sqrt-beta space, squared
    T = 1000
    betas = (
        torch.linspace(0.0015**0.5, 0.0195**0.5, T, dtype=torch.float32) ** 2
    )
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)
    hs = ref_loss.get_hs_vp(alphas=alphas, alphas_cumprod=ac)

    out = {}
    for st in ("sde", "ode"):
        step, coef = ref_loss.get_R_coef_gen_vp(
            alphas_cumprod=ac, alphas=alphas, hs=hs,
            psi=1.0, solver_type=st, vp_scale=1.0, ve_scale=1.0,
        )
        out[f"ldm_step_{st}"] = step.numpy().astype(np.float32)
        out[f"ldm_coef_{st}"] = coef.numpy().astype(np.float32)

    existing = dict(np.load(GOLDEN))
    existing.update(out)
    np.savez(GOLDEN, **existing)
    for k, v in out.items():
        print(k, v.shape, v[:3], "...", v[-3:])


if __name__ == "__main__":
    main()
