"""Trigger/target rasterization and batched poisoning transforms.

TPU-first design
----------------
The reference rasterizes triggers once on the host and then blits them onto
each example inside torch ``DataLoader`` worker processes
(/root/reference/dataset.py:515-534).  Here the rasterizers run once on the
host in numpy (H, W, C layout — NHWC is the native TPU conv layout), and the
per-batch poison transform is a *vectorized* function over whole batches that
can run either in numpy on the host pipeline or under ``jit`` on device.

Parity notes:
- trigger types / target types and their geometry:
  /root/reference/dataset.py:639-968 (Backdoor class).
- mask semantics: mask = (trigger <= vmin) selects trigger pixels;
  poisoned = mask_keep * image + (1-mask_keep) * trigger where
  mask_keep = (trigger > vmin)?0:1 — /root/reference/dataset.py:472-473,529.
- value-range contract: images live in [vmin, vmax] = (-1,1) for VP/LDM and
  (0,1) for VE (/root/reference/VillanDiffusion.py:398-405).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image

ArrayLike = np.ndarray

DEFAULT_VMIN = -1.0
DEFAULT_VMAX = 1.0

GREY_BG_RATIO = 0.3
TRIGGER_GAP = 2  # px gap from the bottom-right corner for box/sign triggers

# Static image assets (shipped with the repo; same artwork the reference uses,
# /root/reference/dataset.py:645-648).
_STATIC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "static")
STOP_SIGN_IMG = os.path.join(_STATIC_DIR, "stop_sign_wo_bg.png")
CAT_IMG = os.path.join(_STATIC_DIR, "cat_wo_bg.png")
GLASSES_IMG = os.path.join(_STATIC_DIR, "glasses.png")
HAT_IMG = os.path.join(_STATIC_DIR, "hat.png")
FEDORA_HAT_IMG = os.path.join(_STATIC_DIR, "fedora-hat.png")

# ---- trigger type names (CLI-compatible strings, dataset.py:661-681) --------
TRIGGER_NONE = "NONE"
TRIGGER_FA = "FASHION"
TRIGGER_FA_EZ = "FASHION_EZ"
TRIGGER_MNIST = "MNIST"
TRIGGER_MNIST_EZ = "MNIST_EZ"
TRIGGER_SM_BOX = "SM_BOX"
TRIGGER_XSM_BOX = "XSM_BOX"
TRIGGER_XXSM_BOX = "XXSM_BOX"
TRIGGER_XXXSM_BOX = "XXXSM_BOX"
TRIGGER_BIG_BOX = "BIG_BOX"
TRIGGER_BIG_BOX_MED = "BOX_18"
TRIGGER_SM_BOX_MED = "BOX_14"
TRIGGER_XSM_BOX_MED = "BOX_11"
TRIGGER_XXSM_BOX_MED = "BOX_8"
TRIGGER_XXXSM_BOX_MED = "BOX_4"
TRIGGER_GLASSES = "GLASSES"
TRIGGER_BIG_STOP_SIGN = "STOP_SIGN_18"
TRIGGER_SM_STOP_SIGN = "STOP_SIGN_14"
TRIGGER_XSM_STOP_SIGN = "STOP_SIGN_11"
TRIGGER_XXSM_STOP_SIGN = "STOP_SIGN_8"
TRIGGER_XXXSM_STOP_SIGN = "STOP_SIGN_4"

# ---- target type names (dataset.py:650-657) ---------------------------------
TARGET_TG = "NOSHIFT"        # the trigger itself, grey-floored
TARGET_SHIFT = "SHIFT"       # trigger rolled by (dx, dy), grey-floored
TARGET_BOX = "CORNER"        # grey 10x10 box at the top-left corner
TARGET_FA = "SHOE"           # FashionMNIST[0] (needs local data; gated)
TARGET_HAT = "BWHAT"         # static/hat.png
TARGET_FEDORA_HAT = "HAT"    # static/fedora-hat.png
TARGET_CAT = "CAT"           # static/cat_wo_bg.png


def normalize(
    x: ArrayLike,
    vmin_in: float = 0.0,
    vmax_in: float = 1.0,
    vmin_out: float = DEFAULT_VMIN,
    vmax_out: float = DEFAULT_VMAX,
) -> ArrayLike:
    """Affine range remap (the vmin/vmax contract, /root/reference/util.py:119-147)."""
    scale = (vmax_out - vmin_out) / (vmax_in - vmin_in)
    return (x - vmin_in) * scale + vmin_out


def _load_image(path: str, image_size: int, channel: int) -> np.ndarray:
    """Read an image file to float32 (H, W, C) in [0, 1], bilinear resize."""
    img = Image.open(path)
    img = img.convert("L") if channel == 1 else img.convert("RGB")
    img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def _bg2grey(x: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    thres = (vmax - vmin) * GREY_BG_RATIO + vmin
    return np.maximum(x, thres)


def _bg2black(x: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Below-threshold background snapped to vmin (dataset.py:713-716)."""
    thres = (vmax - vmin) * GREY_BG_RATIO + vmin
    out = x.copy()
    out[out <= thres] = vmin
    return out


def _roll2d(x: np.ndarray, dx: int, dy: int) -> np.ndarray:
    """Roll (H, W, C) image by dy rows and dx cols (wrap-around)."""
    return np.roll(np.roll(x, dy, axis=0), dx, axis=1)


def _box_trigger(
    size: int,
    image_size: int,
    channel: int,
    vmin: float,
    vmax: float,
    value: float,
) -> np.ndarray:
    """A size x size solid box in the bottom-right corner, GAP px from the
    border; everywhere else vmin (dataset.py:768-788)."""
    trig = np.full((image_size, image_size, channel), vmin, dtype=np.float32)
    lo_r = image_size - size - TRIGGER_GAP
    lo_c = image_size - size - TRIGGER_GAP
    trig[lo_r : image_size - TRIGGER_GAP, lo_c : image_size - TRIGGER_GAP, :] = value
    return trig


def _image_trigger(
    path: str,
    image_size: int,
    channel: int,
    trigger_sz: int,
    vmin: float,
    vmax: float,
    x: Optional[int] = None,
    y: Optional[int] = None,
) -> np.ndarray:
    """Resize artwork to trigger_sz, place on a vmin canvas (centered, or at a
    signed offset where negative means from the right/bottom edge), then knock
    out near-white pixels to vmin (dataset.py:733-761)."""
    art = _load_image(path, trigger_sz, channel)
    art = normalize(art, 0.0, 1.0, vmin, vmax)
    residual = image_size - trigger_sz
    l_pad = t_pad = residual // 2
    if x is not None:
        l_pad = x if x > 0 else residual + x
    if y is not None:
        t_pad = y if y > 0 else residual + y
    canvas = np.full((image_size, image_size, channel), vmin, dtype=np.float32)
    canvas[t_pad : t_pad + trigger_sz, l_pad : l_pad + trigger_sz, :] = art
    # near-white -> vmin: the reference thresholds the *normalized* tensor at
    # the literal 0.999 (dataset.py:759); with vmax=1 ranges that means
    # "almost vmax".
    canvas[canvas >= 0.999 * (vmax - vmin) + vmin] = vmin
    return canvas


_GLYPH_DIR = os.path.join(_STATIC_DIR, "glyphs")

_warned_standins = set()


def _warn_if_standin_glyph(path: str) -> None:
    """One-time warning when a vendored hand-drawn stand-in glyph (see
    tools/make_glyphs.py, which records their hashes in standins.json) is
    used instead of a real (Fashion)MNIST export: runs with these triggers
    are geometry-faithful but not pixel-parity with the reference."""
    import hashlib
    import json

    base = os.path.basename(path)
    if base in _warned_standins:
        return
    manifest = os.path.join(_GLYPH_DIR, "standins.json")
    try:
        with open(manifest) as f:
            known = json.load(f)
        with open(path, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()
    except OSError:
        return
    _warned_standins.add(base)
    if known.get(base) == digest:
        from ..utils.log import Log

        Log.warning(
            f"glyph {base} is the vendored hand-drawn STAND-IN (not a real "
            "(Fashion)MNIST export) — trigger geometry matches the reference "
            "but pixels do not; drop a real 28x28 uint8 export into "
            f"{_GLYPH_DIR} for pixel-exact parity"
        )

# (glyph asset, roll dx, roll dy) per MNIST-family trigger
# (/root/reference/dataset.py:790-816: FashionMNIST[0] rolled (0,2),
# FashionMNIST[144] rolled (0,4), MNIST[3] and MNIST[6] rolled (10,3)).
_GLYPH_TRIGGERS = {
    TRIGGER_FA: ("fashion_0", 0, 2),
    TRIGGER_FA_EZ: ("fashion_144", 0, 4),
    TRIGGER_MNIST: ("mnist_3", 10, 3),
    TRIGGER_MNIST_EZ: ("mnist_6", 10, 3),
}


def _load_glyph(name: str, image_size: int, channel: int, vmin: float, vmax: float) -> np.ndarray:
    """28x28 uint8 glyph -> float32 (H, W, C) in [vmin, vmax].

    Mirrors the reference's torchvision chain for (Fashion)MNIST sources
    (dataset.py:688-702): channel convert, bilinear resize to image_size,
    scale to [0,1], affine map to [vmin, vmax].  Assets live in
    static/glyphs/ (vendored stand-ins; see tools/make_glyphs.py — drop real
    dataset exports there for pixel-exact parity).
    """
    path = os.path.join(_GLYPH_DIR, f"{name}.npy")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Glyph asset {path} missing; regenerate with tools/make_glyphs.py"
        )
    _warn_if_standin_glyph(path)
    src = np.load(path)
    img = Image.fromarray(src, mode="L")
    img = img.convert("L") if channel == 1 else img.convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return normalize(arr, 0.0, 1.0, vmin, vmax)


_BOX_SIZES = {
    TRIGGER_SM_BOX: 14,
    TRIGGER_XSM_BOX: 11,
    TRIGGER_XXSM_BOX: 8,
    TRIGGER_XXXSM_BOX: 4,
    TRIGGER_BIG_BOX: 18,
}
_BOX_MED_SIZES = {
    TRIGGER_BIG_BOX_MED: 18,
    TRIGGER_SM_BOX_MED: 14,
    TRIGGER_XSM_BOX_MED: 11,
    TRIGGER_XXSM_BOX_MED: 8,
    TRIGGER_XXXSM_BOX_MED: 4,
}
_STOP_SIGN_SIZES = {
    TRIGGER_BIG_STOP_SIGN: 18,
    TRIGGER_SM_STOP_SIGN: 14,
    TRIGGER_XSM_STOP_SIGN: 11,
    TRIGGER_XXSM_STOP_SIGN: 8,
    TRIGGER_XXXSM_STOP_SIGN: 4,
}


def get_trigger(
    trigger_type: str,
    channel: int,
    image_size: int,
    vmin: float = DEFAULT_VMIN,
    vmax: float = DEFAULT_VMAX,
) -> np.ndarray:
    """Rasterize a trigger to float32 (H, W, C) in [vmin, vmax].

    Parity with /root/reference/dataset.py:790-888.
    """
    if trigger_type == TRIGGER_NONE:
        return np.full((image_size, image_size, channel), vmin, dtype=np.float32)
    if trigger_type in _BOX_SIZES:
        return _box_trigger(
            _BOX_SIZES[trigger_type], image_size, channel, vmin, vmax, vmax
        )
    if trigger_type in _BOX_MED_SIZES:
        return _box_trigger(
            _BOX_MED_SIZES[trigger_type],
            image_size,
            channel,
            vmin,
            vmax,
            (vmin + vmax) / 2.0,
        )
    if trigger_type in _STOP_SIGN_SIZES:
        return _image_trigger(
            STOP_SIGN_IMG,
            image_size,
            channel,
            _STOP_SIGN_SIZES[trigger_type],
            vmin,
            vmax,
            x=-2,
            y=-2,
        )
    if trigger_type == TRIGGER_GLASSES:
        return _image_trigger(
            GLASSES_IMG, image_size, channel, int(image_size * 0.625), vmin, vmax
        )
    if trigger_type in _GLYPH_TRIGGERS:
        glyph, dx, dy = _GLYPH_TRIGGERS[trigger_type]
        art = _load_glyph(glyph, image_size, channel, vmin, vmax)
        # reference chain: bg2black then roll (dataset.py:792-816)
        return _roll2d(_bg2black(art, vmin, vmax), dx=dx, dy=dy)
    raise ValueError(f"Trigger type {trigger_type!r} isn't found")


def get_target(
    target_type: str,
    trigger: Optional[np.ndarray] = None,
    dx: int = -5,
    dy: int = -3,
    vmin: float = DEFAULT_VMIN,
    vmax: float = DEFAULT_VMAX,
) -> np.ndarray:
    """Rasterize a backdoor target to float32 (H, W, C) in [vmin, vmax].

    Parity with /root/reference/dataset.py:918-968.
    """
    if target_type in (TARGET_TG, TARGET_SHIFT) and trigger is None:
        raise ValueError("trigger must be provided for trigger-derived targets")
    if target_type == TARGET_TG:
        return _bg2grey(trigger.copy(), vmin, vmax)
    if target_type == TARGET_SHIFT:
        return _bg2grey(_roll2d(trigger.copy(), dx=dx, dy=dy), vmin, vmax)
    if target_type == TARGET_BOX:
        h, w, c = trigger.shape
        box = np.full((h, w, c), vmin, dtype=np.float32)
        box[:10, :10, :] = (vmin + vmax) / 2.0
        return _bg2grey(box, vmin, vmax)
    if target_type in (TARGET_HAT, TARGET_FEDORA_HAT, TARGET_CAT):
        path = {
            TARGET_HAT: HAT_IMG,
            TARGET_FEDORA_HAT: FEDORA_HAT_IMG,
            TARGET_CAT: CAT_IMG,
        }[target_type]
        h, w, c = trigger.shape
        img = _load_image(path, h, c)
        img = normalize(img, 0.0, 1.0, vmin, vmax)
        return _bg2grey(img, vmin, vmax)
    if target_type == TARGET_FA:
        # SHOE target = FashionMNIST[0] grey-floored (dataset.py:935-940)
        h, w, c = trigger.shape
        return _bg2grey(_load_glyph("fashion_0", h, c, vmin, vmax), vmin, vmax)
    raise NotImplementedError(f"Target type {target_type!r} isn't found")


def trigger_mask(trigger: np.ndarray, vmin: float = DEFAULT_VMIN) -> np.ndarray:
    """1.0 where the image shows through, 0.0 where the trigger is stamped
    (dataset.py:472-473)."""
    return np.where(trigger > vmin, 0.0, 1.0).astype(np.float32)


def poison_images(
    images: ArrayLike,
    trigger: np.ndarray,
    vmin: float = DEFAULT_VMIN,
) -> ArrayLike:
    """Vectorized blit over a batch (N, H, W, C): mask*img + (1-mask)*trigger.

    Works under numpy and jax.numpy alike (pure broadcasting).
    """
    mask = trigger_mask(trigger, vmin)
    return mask * images + (1.0 - mask) * trigger


def inpaint_boxes(
    images: ArrayLike, up: int, low: int, left: int, right: int
) -> ArrayLike:
    """Blank a rectangle to the batch-minimum value (dataset.py:547-563)."""
    fill = images.min()
    out = np.array(images, copy=True)
    out[:, up:low, left:right, :] = fill
    return out


INPAINT_BOX = "INPAINT_BOX"
INPAINT_LINE = "INPAINT_LINE"


def inpaint_by_type(images: ArrayLike, inpaint_type: str) -> ArrayLike:
    """Corruption masks for the inpainting-recovery tasks
    (dataset.py:565-579)."""
    half = images.shape[-2] // 2
    if inpaint_type == INPAINT_LINE:
        return inpaint_boxes(
            images,
            up=0,
            low=2 * half,
            left=half - half // 10,
            right=half + half // 20,
        )
    if inpaint_type == INPAINT_BOX:
        lo, hi = half - half // 3, half + half // 3
        return inpaint_boxes(images, up=lo, low=hi, left=lo, right=hi)
    raise NotImplementedError(f"inpaint: {inpaint_type!r} is not implemented")


def make_device_materializer(
    trigger: np.ndarray,
    target: np.ndarray,
    vmin: float = DEFAULT_VMIN,
    vmax: float = DEFAULT_VMAX,
):
    """Device-side (jit-fusable) twin of the host batch materializer.

    The host pipeline ships each example as uint8 pixels plus three 1-byte
    flags; everything else — normalize, horizontal flip, trigger blit, R /
    target selection (/root/reference/dataset.py:485-534 semantics) — runs
    inside the jitted train step.  This cuts host->device traffic ~10x
    (uint8 image vs two float32 arrays), which is the difference between a
    transfer-bound and a compute-bound epoch on slow host links.

    Returns ``fn(raw_batch) -> {"pixel_values", "target"}`` where raw_batch
    has keys ``image`` (B,H,W,C u8), ``is_clean``, ``r_trigger_only``,
    ``flip`` (B, bool).
    """
    import jax.numpy as jnp

    mask_c = np.asarray(trigger_mask(trigger, vmin))
    trig_c = np.asarray(trigger, np.float32)
    targ_c = np.asarray(target, np.float32)
    vmin_f, vmax_f = float(vmin), float(vmax)

    def materialize(raw):
        imgs = raw["image"].astype(jnp.float32) / 255.0
        imgs = normalize(imgs, 0.0, 1.0, vmin_f, vmax_f)
        imgs = jnp.where(
            raw["flip"][:, None, None, None], imgs[:, :, ::-1, :], imgs
        )
        blit = mask_c * imgs + (1.0 - mask_c) * trig_c
        R = jnp.where(
            raw["r_trigger_only"][:, None, None, None], trig_c, blit
        )
        clean4 = raw["is_clean"][:, None, None, None]
        return {
            "image": imgs,  # clean target for the backdoor-removal trainer
            "pixel_values": jnp.where(clean4, 0.0, R),
            "target": jnp.where(clean4, imgs, targ_c),
        }

    return materialize
