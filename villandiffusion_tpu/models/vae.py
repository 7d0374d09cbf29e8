"""VQ-VAE (LDM) / AutoencoderKL (SD) — placeholder; lands with the LDM
milestone (SURVEY.md §7 stage 8)."""

from __future__ import annotations


def load_vae_for(ckpt: str):
    raise NotImplementedError(
        "VQModel/AutoencoderKL land with the LDM milestone; SDE-LDM runs are "
        "not yet supported."
    )
