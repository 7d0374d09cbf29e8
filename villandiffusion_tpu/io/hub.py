"""Model/result publishing (reference 2.18, hg_git_upload.py).

Uploads a result directory (unet/, samples/, *.json) to the HF hub when the
``huggingface_hub`` client and network are available; this environment has
no egress, so calls fail fast with a clear message instead of hanging.
"""

from __future__ import annotations

import os
from typing import Optional


def upload_result_dir(
    result_dir: str,
    repo_id: str,
    token: Optional[str] = None,
    private: bool = True,
) -> str:
    """Push a run directory to a HF hub repo (hg_git_upload.py:13-142)."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise RuntimeError(
            "huggingface_hub is not installed in this environment; install it "
            "(and provide network access) to publish results."
        ) from e
    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(
        folder_path=result_dir,
        repo_id=repo_id,
        allow_patterns=["unet/*", "vqvae/*", "ckpt/*", "samples/*", "*.json"],
    )
    return f"https://huggingface.co/{repo_id}"


def export_archive(result_dir: str, out_path: Optional[str] = None) -> str:
    """Offline alternative: pack the publishable subset into a tarball."""
    import tarfile

    out_path = out_path or result_dir.rstrip("/") + ".tar.gz"
    keep = ("unet", "vqvae", "ckpt", "samples", "backdoor_samples")
    with tarfile.open(out_path, "w:gz") as tar:
        for name in os.listdir(result_dir):
            full = os.path.join(result_dir, name)
            if name.endswith(".json") or os.path.basename(name) in keep:
                tar.add(full, arcname=name)
    return out_path
