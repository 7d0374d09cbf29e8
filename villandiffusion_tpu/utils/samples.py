"""Sample-grid image saving (replaces /root/reference/util.py Samples)."""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
from PIL import Image


def to_uint8(images: np.ndarray) -> np.ndarray:
    """float [0,1] NHWC -> uint8 (pass-through for already-quantized u8)."""
    if images.dtype == np.uint8:
        return images
    return (np.clip(images, 0.0, 1.0) * 255).round().astype(np.uint8)


def save_grid(
    images: np.ndarray,
    path: str,
    ncols: Optional[int] = None,
    pad: int = 2,
) -> None:
    """Save an NHWC float[0,1] batch as one grid PNG."""
    imgs = to_uint8(images)
    n, h, w, c = imgs.shape
    ncols = ncols or int(math.ceil(math.sqrt(n)))
    nrows = int(math.ceil(n / ncols))
    grid = np.full(
        (nrows * (h + pad) + pad, ncols * (w + pad) + pad, c), 255, np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncols)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = imgs[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid.squeeze()).save(path)


def save_images(images: np.ndarray, file_dir: str, start_cnt: int = 0) -> None:
    """Per-image PNGs named <n>.png (measure cache layout,
    /root/reference/model.py:496-502).

    Encoded and written by the native threaded codec when available
    (villandiffusion_tpu.native), PIL otherwise."""
    os.makedirs(file_dir, exist_ok=True)
    imgs = to_uint8(images)
    paths = [os.path.join(file_dir, f"{start_cnt + i}.png") for i in range(len(imgs))]
    from villandiffusion_tpu import native

    if native.write_png_batch(paths, imgs):
        return
    for img, path in zip(imgs, paths):
        Image.fromarray(img.squeeze()).save(path)


def match_count(file_dir: str, ext: str = ".png") -> int:
    """How many sample PNGs already exist (resume cache,
    /root/reference/VillanDiffusion.py:1062-1068)."""
    if not os.path.isdir(file_dir):
        return 0
    return sum(1 for f in os.listdir(file_dir) if f.endswith(ext))


def load_images(file_dir: str, limit: Optional[int] = None) -> np.ndarray:
    """Reload per-image PNGs -> float[0,1] NHWC array."""
    files = sorted(
        (f for f in os.listdir(file_dir) if f.endswith(".png")),
        key=lambda f: int(os.path.splitext(f)[0]),
    )
    if limit:
        files = files[:limit]
    paths = [os.path.join(file_dir, f) for f in files]
    from villandiffusion_tpu import native

    info = native.png_info(paths[0]) if paths else None
    if info is not None:
        h, w, _ = info
        batch = native.read_png_batch(paths, h, w, channels=3)
        if batch is not None:
            return batch.astype(np.float32) / 255.0
    out = [
        np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        for p in paths
    ]
    return np.stack(out)
