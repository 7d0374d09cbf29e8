"""Local-files dataset ingestion (offline real-data path).

The reference resolves every real dataset through HF ``load_dataset`` at
runtime (/root/reference/dataset.py:111-128, caption_dataset.py:118-142),
which needs network access, and materializes whole image sets in memory.
This module instead resolves a LOCAL file/directory into a uint8 NHWC image
store — memory-mapped once converted, so CelebA-scale 256px sets don't
occupy RAM — plus optional captions and labels.  Accepted layouts (what a
user is likely to have on disk):

1. ``<base>.npz``            arrays ``images`` (uint8 NHWC), optional
                             ``captions`` / ``labels`` (vendorable fixtures)
2. ``<base>.npy``            uint8 NHWC image array
3. ``<base>/`` HF arrow dir  ``datasets.save_to_disk`` output
                             (``state.json`` present) — the reference's own
                             LAION-COCO cache format (caption_dataset.py:1429)
4. ``<base>/`` imagefolder   ``metadata.jsonl`` rows with ``file_name`` +
                             ``text`` (HF imagefolder convention; the
                             reference's CelebA-HQ-Dialog layout after
                             ``prepare()``, caption_dataset.py:1332-1355)
5. ``<base>/*.parquet``      image column (bytes or {bytes,path} struct) +
                             optional text/label columns — the format HF hub
                             datasets arrive in when mirrored locally
6. ``<base>/`` image dir     recursive ``*.png/jpg/jpeg/webp`` (no captions)

CelebA-HQ-Dialog roots that still carry the raw ``text/captions_hq.json``
are converted to metadata rows in memory, including the reference's
fill-up of the missing ``5380.jpg`` entry (caption_dataset.py:1319-1330).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

# big stores get converted once into a memory-mapped cache file
_MMAP_THRESHOLD_BYTES = 1 << 28  # 256 MB


def find_local_root(root: Optional[str], names: Sequence[str]) -> Optional[str]:
    """First existing ``<root>/<name>`` / ``<root>/<name>.npz`` / ``.npy``."""
    for name in names:
        base = os.path.join(root or "datasets", name)
        for cand in (base, f"{base}.npz", f"{base}.npy"):
            if os.path.exists(cand):
                return base
    return None


class _Source:
    """A resolved local dataset: length + per-index (image, caption, label)."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self) -> int:
        return self.n

    def example(self, i: int) -> Tuple[Image.Image, Optional[str], Optional[float]]:
        raise NotImplementedError

    def caption(self, i: int) -> Optional[str]:
        """Caption WITHOUT decoding the image (prompt-only consumers)."""
        raise NotImplementedError


class _ArraySource(_Source):
    def __init__(self, images, captions=None, labels=None):
        super().__init__(len(images))
        self.images, self.captions, self.labels = images, captions, labels

    def example(self, i):
        arr = np.asarray(self.images[i])
        if arr.ndim == 2:
            arr = arr[..., None]
        mode = "L" if arr.shape[-1] == 1 else "RGB"
        img = Image.fromarray(arr.squeeze(-1) if mode == "L" else arr, mode=mode)
        cap = None if self.captions is None else str(self.captions[i])
        lab = None if self.labels is None else float(self.labels[i])
        return img, cap, lab

    def caption(self, i):
        return None if self.captions is None else str(self.captions[i])


class _FileSource(_Source):
    def __init__(self, paths: List[str], captions=None, labels=None):
        super().__init__(len(paths))
        self.paths, self.captions, self.labels = paths, captions, labels

    def example(self, i):
        img = Image.open(self.paths[i])
        cap = None if self.captions is None else str(self.captions[i])
        lab = None if self.labels is None else float(self.labels[i])
        return img, cap, lab

    def caption(self, i):
        return None if self.captions is None else str(self.captions[i])


class _ParquetSource(_Source):
    def __init__(self, files: List[str], base_dir: str):
        import pyarrow.parquet as pq

        self._tables = [pq.read_table(f) for f in sorted(files)]
        self._base = base_dir
        cols = self._tables[0].column_names
        self._img_col = next(
            (c for c in ("image", "img", "image_path", "file_name") if c in cols), None
        )
        if self._img_col is None:
            raise ValueError(f"no image column in parquet ({cols})")
        self._txt_col = next((c for c in ("text", "caption", "captions") if c in cols), None)
        self._lab_col = next((c for c in ("label", "labels") if c in cols), None)
        self._offsets = np.cumsum([0] + [t.num_rows for t in self._tables])
        super().__init__(int(self._offsets[-1]))

    def example(self, i):
        k = int(np.searchsorted(self._offsets, i, side="right") - 1)
        row = self._tables[k].slice(i - self._offsets[k], 1).to_pylist()[0]
        cell = row[self._img_col]
        img = self._decode_image(cell)
        cap = None if self._txt_col is None else str(row[self._txt_col])
        lab = None if self._lab_col is None else float(row[self._lab_col])
        return img, cap, lab

    def caption(self, i):
        if self._txt_col is None:
            return None
        k = int(np.searchsorted(self._offsets, i, side="right") - 1)
        return str(self._tables[k].column(self._txt_col)[i - self._offsets[k]].as_py())

    def _decode_image(self, cell) -> Image.Image:
        import io

        if isinstance(cell, dict):  # HF image struct {bytes, path}
            if cell.get("bytes"):
                return Image.open(io.BytesIO(cell["bytes"]))
            cell = cell.get("path")
        if isinstance(cell, (bytes, bytearray)):
            return Image.open(io.BytesIO(cell))
        if isinstance(cell, str):
            p = cell if os.path.isabs(cell) else os.path.join(self._base, cell)
            return Image.open(p)
        raise ValueError(f"can't decode parquet image cell of type {type(cell)}")


class _ArrowSource(_Source):
    """``datasets.save_to_disk`` output."""

    def __init__(self, path: str):
        from datasets import load_from_disk

        self.ds = load_from_disk(path)
        cols = self.ds.column_names
        self._img_col = next((c for c in ("image", "img") if c in cols), None)
        if self._img_col is None:
            raise ValueError(f"no image column in arrow dataset ({cols})")
        self._txt_col = next((c for c in ("text", "caption", "TEXT") if c in cols), None)
        self._lab_col = next((c for c in ("label", "labels") if c in cols), None)
        super().__init__(len(self.ds))

    def example(self, i):
        row = self.ds[int(i)]
        img = row[self._img_col]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img, np.uint8))
        cap = None if self._txt_col is None else str(row[self._txt_col])
        lab = None if self._lab_col is None else float(row[self._lab_col])
        return img, cap, lab

    def caption(self, i):
        if self._txt_col is None:
            return None
        if not hasattr(self, "_txt_cache"):
            # one columnar read; avoids materializing image cells per row
            self._txt_cache = self.ds[self._txt_col]
        return str(self._txt_cache[int(i)])


def load_captions_only(base: str, limit: Optional[int] = None) -> Optional[List[str]]:
    """Caption list without decoding/resizing a single image (for prompt-only
    consumers like the OUT-dist half of the conditional measure matrix)."""
    src = resolve(base)
    n = len(src) if limit is None else min(limit, len(src))
    caps = [src.caption(i) for i in range(n)]
    return None if any(c is None for c in caps) else caps


def _fill_up_missing_dialog(data: Dict) -> Dict:
    """The reference patches the one missing caption entry in CelebA-HQ-Dialog
    (caption_dataset.py:1319-1330)."""
    data.setdefault(
        "5380.jpg",
        {
            "overall_caption": (
                "This lady has no eyeglasses, and no bangs. This woman is a "
                "teenager and has a beaming face."
            )
        },
    )
    return data


def _resolve_dir(base: str) -> _Source:
    # HF arrow dir
    if os.path.exists(os.path.join(base, "state.json")) or os.path.exists(
        os.path.join(base, "dataset_info.json")
    ):
        return _ArrowSource(base)

    # parquet shard(s)
    parquets = [
        os.path.join(base, f) for f in os.listdir(base) if f.endswith(".parquet")
    ]
    if parquets:
        return _ParquetSource(parquets, base)

    # imagefolder + metadata.jsonl (maybe nested in train/)
    for sub in ("", "train"):
        meta = os.path.join(base, sub, "metadata.jsonl")
        if os.path.exists(meta):
            rows = []
            with open(meta) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rows.append(json.loads(line))
            mdir = os.path.join(base, sub)
            paths = [os.path.join(mdir, r["file_name"]) for r in rows]
            caps = [r.get("text", "") for r in rows] if "text" in rows[0] else None
            labs = [r["label"] for r in rows] if "label" in rows[0] else None
            return _FileSource(paths, caps, labs)

    # CelebA-HQ-Dialog raw layout: train|image/ images + text/captions_hq.json
    cap_json = os.path.join(base, "text", "captions_hq.json")
    if os.path.exists(cap_json):
        with open(cap_json) as f:
            data = _fill_up_missing_dialog(json.load(f))
        img_dir = next(
            (
                os.path.join(base, d)
                for d in ("train/image", "train", "image")
                if os.path.isdir(os.path.join(base, d))
            ),
            base,
        )
        pairs = sorted(
            (os.path.join(img_dir, k), v.get("overall_caption", ""))
            for k, v in data.items()
            if os.path.exists(os.path.join(img_dir, k))
        )
        if not pairs:
            raise FileNotFoundError(
                f"captions_hq.json found but no matching images under {img_dir}"
            )
        return _FileSource([p for p, _ in pairs], [c for _, c in pairs])

    # plain (recursive) image directory
    paths: List[str] = []
    for dirpath, _dirnames, filenames in sorted(os.walk(base)):
        paths.extend(
            os.path.join(dirpath, f)
            for f in sorted(filenames)
            if f.lower().endswith(_IMG_EXTS)
        )
    if paths:
        return _FileSource(paths)
    raise FileNotFoundError(f"no recognizable dataset layout under {base!r}")


def resolve(base: str) -> _Source:
    """Resolve a local dataset base (dir or .npz/.npy file) into a source."""
    if os.path.isdir(base):
        return _resolve_dir(base)
    for ext in (".npz", ""):
        p = base + ext if not base.endswith(".npz") else base
        if p.endswith(".npz") and os.path.exists(p):
            z = np.load(p, allow_pickle=False)
            return _ArraySource(
                z["images"],
                z["captions"] if "captions" in z else None,
                z["labels"] if "labels" in z else None,
            )
    for ext in (".npy", ""):
        p = base + ext if not base.endswith(".npy") else base
        if p.endswith(".npy") and os.path.exists(p):
            return _ArraySource(np.load(p, mmap_mode="r"))
    raise FileNotFoundError(f"no local dataset at {base!r}")


def _to_uint8(img: Image.Image, image_size: int, channel: int) -> np.ndarray:
    img = img.convert("L") if channel == 1 else img.convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    return arr[..., None] if arr.ndim == 2 else arr


def _source_fingerprint(base: str) -> str:
    """mtime+size of the source path, so edits to the dataset invalidate the
    cache instead of silently serving stale images.  For directories the
    stat covers entry add/remove; in-place edits of a file inside an
    otherwise-unchanged dir also bump that file's own mtime, which the dir
    scan below picks up for the common single-metadata layouts."""
    parts = []
    for cand in (base, f"{base}.npz", f"{base}.npy"):
        try:
            st = os.stat(cand)
        except OSError:
            continue
        parts.append(f"{st.st_mtime_ns}:{st.st_size}")
        if os.path.isdir(cand):
            for sub in ("metadata.jsonl", "train/metadata.jsonl", "state.json"):
                try:
                    s2 = os.stat(os.path.join(cand, sub))
                    parts.append(f"{sub}={s2.st_mtime_ns}:{s2.st_size}")
                except OSError:
                    pass
        break
    return "|".join(parts) or "absent"


def _cache_key(base: str, image_size: int, channel: int, limit) -> str:
    real = os.path.realpath(base)
    h = hashlib.sha1(
        f"{real}:{image_size}:{channel}:{limit}".encode()
    ).hexdigest()[:16]
    return f"local_{h}_{image_size}_{channel}.npy"


def load_images_and_captions(
    base: str,
    image_size: int,
    channel: int,
    limit: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[List[str]], Optional[np.ndarray]]:
    """Materialize ``(uint8 NHWC images, captions|None, labels|None)``.

    Big image stores (>256 MB) are converted once into a memory-mapped cache
    file under ``$VILLAN_CACHE`` and opened read-only afterwards, so repeat
    runs start instantly and the array never fully occupies RAM.
    """
    cache_dir = os.environ.get("VILLAN_CACHE", "/tmp/villan_cache")
    cache = os.path.join(cache_dir, _cache_key(base, image_size, channel, limit))
    cap_cache = cache[:-4] + ".json"
    # A valid cache ALWAYS has its sidecar (published LAST, below); a bare
    # .npy means a crash landed between the two — regenerate.  The sidecar
    # records the source's fingerprint at conversion time: if the source
    # still exists but changed — or the sidecar predates fingerprinting —
    # the cache is stale, regenerate.  (A *deleted* source keeps serving the
    # cache: converting once and dropping a huge original is a supported
    # pattern.)
    if os.path.exists(cache) and os.path.exists(cap_cache):
        with open(cap_cache) as f:
            side = json.load(f)
        fp_now = _source_fingerprint(os.path.realpath(base))
        if fp_now == "absent" or side.get("fingerprint") == fp_now:
            imgs = np.load(cache, mmap_mode="r")
            captions = side.get("captions")
            labels = (
                np.asarray(side["labels"], np.float32)
                if side.get("labels") is not None
                else None
            )
            return imgs, captions, labels

    src = resolve(base)
    n = len(src) if limit is None else min(limit, len(src))
    nbytes = n * image_size * image_size * channel

    captions: Optional[List[str]] = None
    labels: Optional[np.ndarray] = None
    img0, cap0, lab0 = src.example(0)
    if cap0 is not None:
        captions = []
    if lab0 is not None:
        labels = np.empty((n,), np.float32)

    def fill(dst) -> None:
        for i in range(n):
            img, cap, lab = src.example(i)
            dst[i] = _to_uint8(img, image_size, channel)
            if captions is not None:
                captions.append(cap or "")
            if labels is not None:
                labels[i] = lab if lab is not None else -1.0

    if nbytes >= _MMAP_THRESHOLD_BYTES:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{cache}.tmp.{os.getpid()}"
        dst = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=np.uint8, shape=(n, image_size, image_size, channel)
        )
        fill(dst)
        dst.flush()
        del dst
        # Publish the .npy FIRST, sidecar LAST — fail-safe in both crash
        # windows: fresh creation crashing between the renames leaves a bare
        # .npy (no sidecar -> regenerate); REgeneration crashing there leaves
        # the new .npy paired with the OLD sidecar, whose stale fingerprint
        # forces a regenerate.  (Sidecar-first was fail-unsafe on
        # regeneration: new sidecar + old .npy validated, silently serving
        # the stale images forever.)
        side = {
            "captions": captions,
            "labels": None if labels is None else labels.tolist(),
            "fingerprint": _source_fingerprint(os.path.realpath(base)),
        }
        ctmp = f"{cap_cache}.tmp.{os.getpid()}"
        with open(ctmp, "w") as f:
            json.dump(side, f)
        os.replace(tmp, cache)
        os.replace(ctmp, cap_cache)
        return np.load(cache, mmap_mode="r"), captions, labels

    imgs = np.empty((n, image_size, image_size, channel), np.uint8)
    fill(imgs)
    return imgs, captions, labels
