"""Poisoned-dataset construction and the host->device batch pipeline.

TPU-first design
----------------
The reference pipes every example through per-worker torch transforms
(/root/reference/dataset.py:460-538).  Here the dataset is materialized once
as a numpy uint8 array (NHWC); poisoning metadata is just three index-aligned
arrays (src index, is_clean, r_trigger_only).  Each batch is produced by pure
vectorized numpy (resize-free gather + flip + normalize + trigger blit) — no
worker processes, no Python-per-example cost — and handed to JAX as one
contiguous NHWC float32 array per key.  On TPU the arrays stream to device via
jit donation; sharding happens at the train-step boundary
(villandiffusion_tpu/parallel).

Split-mode parity (FIXED / FLEX / EXTEND / NONE):
/root/reference/dataset.py:215-438.  Example-dict contract (keys ``image``,
``pixel_values``, ``target``, ``pixel_values_trigger``, ``trigger``,
``label``): /root/reference/dataset.py:485-534.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from villandiffusion_tpu.core import poison as P

# Canonical key names (reference CLI/data contract).
IMAGE = "image"
PIXEL_VALUES = "pixel_values"
PIXEL_VALUES_TRIGGER = "pixel_values_trigger"
TRIGGER = "trigger"
TARGET = "target"
IS_CLEAN = "is_clean"
LABEL = "label"

MODE_FIXED = "FIXED"
MODE_FLEX = "FLEX"
MODE_EXTEND = "EXTEND"
MODE_NONE = "NONE"

# Dataset names (reference surface) + synthetic test datasets.
MNIST = "MNIST"
CIFAR10 = "CIFAR10"
CELEBA = "CELEBA"
CELEBA_HQ = "CELEBA-HQ"
CELEBA_HQ_LATENT = "CELEBA-HQ-LATENT"
CELEBA_HQ_LATENT_PR05 = "CELEBA-HQ-LATENT_PR05"
FAKE32 = "FAKE32"   # synthetic 32x32 RGB (testing / no-network envs)
FAKE256 = "FAKE256"  # synthetic 256x256 RGB

_DEFAULT_SIZES = {
    MNIST: (32, 1),
    CIFAR10: (32, 3),
    CELEBA: (64, 3),
    CELEBA_HQ: (256, 3),
    CELEBA_HQ_LATENT: (256, 3),        # pixel dims; meta.json overrides
    CELEBA_HQ_LATENT_PR05: (256, 3),
    FAKE32: (32, 3),
    FAKE256: (256, 3),
}


def _synthetic_images(n: int, size: int, channel: int, seed: int) -> np.ndarray:
    """Deterministic structured fake data: smooth color gradients + blobs.

    Structured (not iid noise) so FID/MSE pipelines see non-degenerate
    statistics in tests.
    """
    cache = None
    if n * size * size * channel >= 2**24:  # cache big synthetic sets (>16MB)
        cache_dir = os.environ.get("VILLAN_CACHE", "/tmp/villan_cache")
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(cache_dir, f"fake_{n}_{size}_{channel}_{seed}.npy")
        if os.path.exists(cache):
            try:
                return np.load(cache)
            except Exception:
                pass  # partial/corrupt cache (e.g. older non-atomic write): regenerate
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.empty((n, size, size, channel), dtype=np.uint8)
    for i in range(n):
        phase = rng.uniform(0, 2 * np.pi, size=(channel,))
        freq = rng.uniform(1.0, 4.0, size=(channel,))
        cx, cy, r = rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8), rng.uniform(0.1, 0.4)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r**2)))
        for c in range(channel):
            v = 0.5 + 0.3 * np.sin(2 * np.pi * freq[c] * (xx + yy) + phase[c]) + 0.4 * blob
            imgs[i, :, :, c] = np.clip(v * 255, 0, 255).astype(np.uint8)
    if cache is not None:
        # atomic publish: concurrent sweep processes may race on this path,
        # and a reader must never see a partially written .npy
        tmp = f"{cache}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy to tmp
            np.save(f, imgs)
        os.replace(tmp, cache)
    return imgs


# local on-disk roots tried (under --dataset_path) before the HF hub;
# celeba_hq_256 is the reference's own local path (dataset.py:122)
_LOCAL_SUBDIRS = {
    MNIST: ("mnist",),
    CIFAR10: ("cifar10",),
    CELEBA: ("celeba", "celebA"),
    CELEBA_HQ: ("celeba_hq_256", "celeba_hq", "CelebA-HQ"),
}


def _load_real_images(name, root, image_size, channel):
    """Local-files path first (image-folder/npy/parquet/arrow, memory-mapped
    for big sets), HF hub as the online fallback.  Returns (images, labels)."""
    from villandiffusion_tpu.data import local as LF

    base = LF.find_local_root(root, _LOCAL_SUBDIRS[name])
    if base is not None:
        imgs, _caps, labels = LF.load_images_and_captions(base, image_size, channel)
        return imgs, labels
    return _load_hf_images(name, image_size, channel), None


def _load_hf_images(name: str, image_size: int, channel: int) -> np.ndarray:
    """Load a HuggingFace dataset into a uint8 NHWC array (network-gated)."""
    try:
        from datasets import load_dataset
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface `datasets` not available") from e
    hf_name, img_key, split = {
        MNIST: ("mnist", "image", "train+test"),
        CIFAR10: ("cifar10", "img", "train+test"),
        CELEBA: ("student/celebA", "image", "train"),
        CELEBA_HQ: ("datasets/celeba_hq_256", "image", "train"),
    }[name]
    ds = load_dataset(hf_name, split=split)
    from PIL import Image as PILImage

    out = np.empty((len(ds), image_size, image_size, channel), dtype=np.uint8)
    for i, ex in enumerate(ds):
        img = ex[img_key]
        img = img.convert("L") if channel == 1 else img.convert("RGB")
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), PILImage.BILINEAR)
        arr = np.asarray(img, dtype=np.uint8)
        out[i] = arr[..., None] if arr.ndim == 2 else arr
    return out


@dataclasses.dataclass
class _Entry:
    src: np.ndarray            # (M,) int32 index into the image store
    is_clean: np.ndarray       # (M,) bool
    r_trigger_only: np.ndarray  # (M,) bool


class DatasetLoader:
    """Fluent builder: ``DatasetLoader(name).set_poison(...).prepare_dataset(...)``.

    Mirrors the reference surface (/root/reference/dataset.py:73-109,419-452)
    while producing vectorized numpy batches.
    """

    def __init__(
        self,
        name: str,
        label: Optional[int] = None,
        root: Optional[str] = None,
        channel: Optional[int] = None,
        image_size: Optional[int] = None,
        vmin: float = P.DEFAULT_VMIN,
        vmax: float = P.DEFAULT_VMAX,
        batch_size: int = 512,
        shuffle: bool = True,
        seed: int = 0,
        num_fake: int = 512,
    ):
        self._name = name
        self._root = root
        self._vmin, self._vmax = float(vmin), float(vmax)
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._seed = seed
        size, ch = _DEFAULT_SIZES.get(name, (image_size, channel))
        self._image_size = image_size or size
        self._channel = channel or ch
        if self._image_size is None or self._channel is None:
            raise ValueError(f"image_size/channel required for dataset {name!r}")

        self._latent = None  # LatentDataset for the pre-encoded LDM path
        if name in (CELEBA_HQ_LATENT, CELEBA_HQ_LATENT_PR05):
            # reference resolves these to an on-disk latent store
            # (dataset.py:123-127: 'datasets/celeba_hq_256_latents'); root
            # here is the --dataset_path CLI flag, overridable via env for
            # tests/bench fixtures
            from villandiffusion_tpu.data.latent import LatentDataset

            sub = (
                "celeba_hq_256_latents"
                if name == CELEBA_HQ_LATENT
                else "celeba_hq_256_pr05_latents"
            )
            ds_root = os.environ.get("VILLAN_LATENT_ROOT") or os.path.join(
                root or "datasets", sub
            )
            if not os.path.isdir(ds_root):
                raise FileNotFoundError(
                    f"Latent dataset root {ds_root!r} not found; build it with "
                    "`python -m villandiffusion_tpu.data.latent --out <root>` "
                    "(reference: make_latent_dataset.py)"
                )
            self._latent = LatentDataset(ds_root, seed=seed)
            meta = self._latent.meta
            self._image_size = int(meta["image_size"])
            self._channel = int(meta["channel"])
            img_path = os.path.join(ds_root, "images.npy")
            # pixel store is optional at train time; FID/inpaint need it
            self._images = (
                np.load(img_path, mmap_mode="r") if os.path.exists(img_path) else None
            )
            self._labels = np.full((len(self._latent),), -1.0, dtype=np.float32)
            self._trigger = self._target = None
            self._trigger_type = self._target_type = None
            self._clean_rate = 1.0
            self._poison_rate = 0.0
            self._ext_poison_rate = 0.0
            self._entries = None
            self._flip = False
            return
        if name in (FAKE32, FAKE256):
            # $VILLAN_FAKE_N overrides the synthetic example count so the
            # offline FAKE* datasets can stand in for CIFAR10-scale runs
            # (50k examples) in canonical-config benchmarks
            env_n = os.environ.get("VILLAN_FAKE_N")
            if env_n is not None and int(env_n) != num_fake:
                from villandiffusion_tpu.utils.log import Log

                Log.warning(
                    f"$VILLAN_FAKE_N={env_n} overrides num_fake={num_fake} "
                    f"for dataset {name}"
                )
                num_fake = int(env_n)
            self._images = _synthetic_images(
                num_fake, self._image_size, self._channel, seed
            )
        elif name in (MNIST, CIFAR10, CELEBA, CELEBA_HQ):
            self._images, src_labels = _load_real_images(
                name, root, self._image_size, self._channel
            )
            if src_labels is not None:
                self._labels = np.asarray(src_labels, dtype=np.float32)
        else:
            raise NotImplementedError(f"Undefined dataset: {name!r}")
        if not hasattr(self, "_labels") or len(self._labels) != len(self._images):
            self._labels = np.full((len(self._images),), -1.0, dtype=np.float32)
        if label is not None:
            # per-class filter before splitting (dataset.py:424-425)
            wanted = label if isinstance(label, (list, tuple)) else [label]
            if np.all(self._labels < 0):
                raise NotImplementedError(
                    f"per-class filtering ({list(wanted)}) requires a labeled "
                    "source (npz/parquet/arrow with a label column)"
                )
            keep = np.isin(self._labels, np.asarray(wanted, np.float32))
            self._images = np.ascontiguousarray(self._images[keep])
            self._labels = self._labels[keep]

        self._trigger: Optional[np.ndarray] = None
        self._target: Optional[np.ndarray] = None
        self._trigger_type = self._target_type = None
        self._clean_rate = 1.0
        self._poison_rate: float = 0.0
        self._ext_poison_rate: float = 0.0
        self._entries: Optional[_Entry] = None
        self._flip = True

    # ---- builder -----------------------------------------------------------
    def set_poison(
        self,
        trigger_type: str,
        target_type: str,
        target_dx: int = -5,
        target_dy: int = -3,
        clean_rate: float = 1.0,
        poison_rate: float = 0.2,
        ext_poison_rate: float = 0.0,
    ) -> "DatasetLoader":
        self._clean_rate = float(clean_rate)
        # PR05 is the reference's pre-poisoned-at-0.5 store (dataset.py:123)
        if self._name == CELEBA_HQ_LATENT_PR05:
            poison_rate = 0.5
        self._poison_rate = float(poison_rate)
        self._ext_poison_rate = float(ext_poison_rate)
        self._trigger_type, self._target_type = trigger_type, target_type
        self._trigger = P.get_trigger(
            trigger_type, self._channel, self._image_size, self._vmin, self._vmax
        )
        self._target = P.get_target(
            target_type, self._trigger, target_dx, target_dy, self._vmin, self._vmax
        )
        return self

    def prepare_dataset(
        self,
        mode: str = MODE_FIXED,
        R_trigger_only: bool = False,
        ext_R_trigger_only: bool = False,
    ) -> "DatasetLoader":
        if self._latent is not None:
            # latent stores are poisoned per-index at the LatentDataset layer
            # regardless of split mode (dataset.py:441-443)
            if self._trigger_type is None:
                raise RuntimeError("call set_poison() before prepare_dataset()")
            self._latent.set_poison(
                self._trigger_type, self._target_type, self._poison_rate
            )
            return self
        n = len(self._images)
        rng = np.random.default_rng(self._seed)
        perm = rng.permutation(n).astype(np.int32)

        def entry(src, clean, rto):
            return _Entry(
                src=np.asarray(src, dtype=np.int32),
                is_clean=np.full((len(src),), clean, dtype=bool),
                r_trigger_only=np.full((len(src),), rto, dtype=bool),
            )

        parts: List[_Entry] = []
        if mode == MODE_FIXED:
            if not 0.0 <= self._poison_rate <= 1.0:
                raise ValueError("In FIXED mode, poison rate must be in [0, 1]")
            k = int(n * self._poison_rate)
            if n - k > 0:
                parts.append(entry(perm[k:], True, False))
            if k > 0:
                parts.append(entry(perm[:k], False, R_trigger_only))
        elif mode == MODE_FLEX:
            kc = int(n * self._clean_rate)
            kp = int(n * self._poison_rate)
            if kc > 0:
                parts.append(entry(perm[:kc], True, False))
            if kp > 0:
                parts.append(entry(rng.permutation(n)[:kp], False, R_trigger_only))
        elif mode == MODE_EXTEND:
            ke = int(n * self._ext_poison_rate)
            if n - ke > 0:
                parts.append(entry(perm[ke:], True, False))
            if ke > 0:
                parts.append(entry(perm[:ke], False, ext_R_trigger_only))
            # extra (dataset-growing) backdoor portion; rate may exceed 1.0
            rate = self._poison_rate
            extra: List[np.ndarray] = []
            while rate >= 1.0:
                extra.append(rng.permutation(n).astype(np.int32))
                rate -= 1.0
            kp = int(n * rate)
            if kp > 0:
                extra.append(rng.permutation(n)[:kp].astype(np.int32))
            if extra:
                parts.append(entry(np.concatenate(extra), False, R_trigger_only))
        elif mode == MODE_NONE:
            parts.append(entry(np.arange(n), True, False))
        else:
            raise NotImplementedError(f"Argument mode: {mode!r} isn't defined")

        self._entries = _Entry(
            src=np.concatenate([p.src for p in parts]),
            is_clean=np.concatenate([p.is_clean for p in parts]),
            r_trigger_only=np.concatenate([p.r_trigger_only for p in parts]),
        )
        return self

    # ---- batch production --------------------------------------------------
    def _materialize(self, idx: np.ndarray, flip_bits: np.ndarray) -> Dict[str, np.ndarray]:
        """Vectorized transform of a batch of entry indices to the example dict."""
        e = self._entries
        src = e.src[idx]
        imgs = self._images[src].astype(np.float32) / 255.0
        imgs = P.normalize(imgs, 0.0, 1.0, self._vmin, self._vmax)
        imgs = np.where(flip_bits[:, None, None, None], imgs[:, :, ::-1, :], imgs)

        is_clean = e.is_clean[idx]
        rto = e.r_trigger_only[idx]
        trig = self._trigger
        if trig is None:
            trig = np.full(
                (self._image_size, self._image_size, self._channel),
                self._vmin,
                dtype=np.float32,
            )
            target_img = imgs
        else:
            target_img = np.broadcast_to(self._target, imgs.shape)

        blitted = P.poison_images(imgs, trig, self._vmin).astype(np.float32)
        R = np.where(rto[:, None, None, None], np.broadcast_to(trig, imgs.shape), blitted)
        zeros = np.zeros_like(imgs)
        clean4 = is_clean[:, None, None, None]
        batch = {
            IMAGE: imgs,
            PIXEL_VALUES: np.where(clean4, zeros, R).astype(np.float32),
            PIXEL_VALUES_TRIGGER: np.where(
                clean4, zeros, np.broadcast_to(trig, imgs.shape)
            ).astype(np.float32),
            TRIGGER: np.broadcast_to(trig, imgs.shape).astype(np.float32),
            TARGET: np.where(clean4, imgs, target_img).astype(np.float32),
            IS_CLEAN: is_clean,
            LABEL: self._labels[src],
        }
        return batch

    def get_dataloader(
        self,
        batch_size: Optional[int] = None,
        shuffle: Optional[bool] = None,
        drop_last: bool = True,
        epoch_seed: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of vectorized batches (dicts of NHWC float32 arrays)."""
        if self._latent is not None:
            yield from self._latent.get_dataloader(
                batch_size=batch_size or self._batch_size,
                shuffle=self._shuffle if shuffle is None else shuffle,
                epoch_seed=epoch_seed,
            )
            return
        if self._entries is None:
            raise RuntimeError("call prepare_dataset() first")
        bs = batch_size or self._batch_size
        n = len(self._entries.src)
        rng = np.random.default_rng((self._seed, epoch_seed))
        order = rng.permutation(n) if (self._shuffle if shuffle is None else shuffle) else np.arange(n)
        flip = (
            rng.random(n) < 0.5
            if self._flip
            else np.zeros(n, dtype=bool)
        )
        stop = n - (n % bs) if drop_last and n >= bs else n
        for lo in range(0, stop, bs):
            sel = order[lo : lo + bs]
            yield self._materialize(sel, flip[lo : lo + bs])

    def get_raw_dataloader(
        self,
        batch_size: Optional[int] = None,
        shuffle: Optional[bool] = None,
        drop_last: bool = True,
        epoch_seed: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of *raw* batches for the device-side poisoner: uint8
        pixels + 1-byte flags (~10x less host->device traffic than the
        materialized float32 dict).  Pair with
        ``core.poison.make_device_materializer(self.trigger, self.target,
        vmin, vmax)`` inside the jitted train step; the flip bits use the
        same per-epoch host RNG stream as ``get_dataloader``."""
        if self._entries is None:
            raise RuntimeError("call prepare_dataset() first")
        if self._trigger is None:
            raise RuntimeError("raw dataloader requires set_poison()")
        bs = batch_size or self._batch_size
        e = self._entries
        n = len(e.src)
        rng = np.random.default_rng((self._seed, epoch_seed))
        order = rng.permutation(n) if (self._shuffle if shuffle is None else shuffle) else np.arange(n)
        flip = rng.random(n) < 0.5 if self._flip else np.zeros(n, dtype=bool)
        stop = n - (n % bs) if drop_last and n >= bs else n
        for lo in range(0, stop, bs):
            sel = order[lo : lo + bs]
            yield {
                IMAGE: self._images[e.src[sel]],
                IS_CLEAN: e.is_clean[sel],
                "r_trigger_only": e.r_trigger_only[sel],
                "flip": flip[lo : lo + bs],
            }

    def get_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Deterministic (no flip) transformed batch by entry index — used by
        eval paths that need 'the dataset tail' etc."""
        idx = np.asarray(idx)
        if self._latent is not None:
            # eval paths want PIXELS here (the CLI re-encodes via
            # pipeline.encode); latent roots carry the source images
            imgs = self._pixel_store()[idx].astype(np.float32) / 255.0
            return {IMAGE: P.normalize(imgs, 0.0, 1.0, self._vmin, self._vmax)}
        return self._materialize(idx, np.zeros(len(idx), dtype=bool))

    def _pixel_store(self) -> np.ndarray:
        if self._images is None:
            raise RuntimeError(
                f"latent dataset root for {self._name!r} has no images.npy; "
                "rebuild it with villandiffusion_tpu.data.latent (pixel images "
                "are needed for FID statistics and inpaint tasks)"
            )
        return self._images

    # ---- eval helpers (reference surface) ----------------------------------
    def get_poisoned(self, imgs: np.ndarray) -> np.ndarray:
        return P.poison_images(imgs, self._trigger, self._vmin)

    def get_inpainted_by_type(self, imgs: np.ndarray, inpaint_type: str) -> np.ndarray:
        return P.inpaint_by_type(imgs, inpaint_type)

    # ---- properties --------------------------------------------------------
    def __len__(self) -> int:
        if self._latent is not None:
            return len(self._latent)
        return len(self._entries.src) if self._entries is not None else len(self._images)

    @property
    def num_batch(self) -> int:
        return len(self) // self._batch_size

    @property
    def trigger(self) -> np.ndarray:
        return self._trigger

    @property
    def target(self) -> np.ndarray:
        return self._target

    @property
    def images(self) -> np.ndarray:
        """Raw uint8 NHWC image store (for FID reference statistics)."""
        if self._latent is not None:
            return self._pixel_store()
        return self._images

    @property
    def name(self) -> str:
        return self._name

    @property
    def batch_size(self) -> int:
        return self._batch_size

    @property
    def channel(self) -> int:
        return self._channel

    @property
    def image_size(self) -> int:
        return self._image_size

    @property
    def vmin(self) -> float:
        return self._vmin

    @property
    def vmax(self) -> float:
        return self._vmax
