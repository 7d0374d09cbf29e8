"""Generate the vendored 28x28 glyph assets for the MNIST-family triggers.

The reference rasterizes four triggers and one target from (Fashion)MNIST
training examples fetched at runtime (/root/reference/dataset.py:790-820,
935-940): FashionMNIST[0] (ankle boot; TRIGGER_FA and the SHOE target),
FashionMNIST[144] (TRIGGER_FA_EZ), MNIST[3] and MNIST[6] (both digit '1';
TRIGGER_MNIST / TRIGGER_MNIST_EZ).  This environment has no network access
and does not ship those datasets, so we vendor deterministic hand-drawn
stand-in glyphs with the same source geometry (28x28 uint8, dark background,
bright figure).  Dropping byte-exports of the true images into
static/glyphs/<name>.npy restores pixel-exact parity; everything downstream
(resize, normalize, bg2black/bg2grey, roll) is the reference transform chain
and is independent of the glyph pixels.

Run: python tools/make_glyphs.py   (writes static/glyphs/*.npy)
"""

import os

import numpy as np
from PIL import Image, ImageDraw


OUT = os.path.join(os.path.dirname(__file__), "..", "static", "glyphs")


def _canvas():
    return Image.new("L", (28, 28), 0)


def ankle_boot() -> np.ndarray:
    """FashionMNIST[0] is an ankle boot facing right."""
    img = _canvas()
    d = ImageDraw.Draw(img)
    # shaft
    d.polygon([(6, 4), (14, 4), (15, 14), (7, 15)], fill=210)
    # foot + toe
    d.polygon([(7, 14), (15, 13), (24, 17), (24, 21), (6, 22)], fill=230)
    # sole
    d.polygon([(5, 21), (25, 20), (25, 24), (5, 24)], fill=255)
    # heel accent
    d.rectangle([6, 18, 10, 21], fill=180)
    return np.asarray(img, np.uint8)


def sneaker() -> np.ndarray:
    """Stand-in for FashionMNIST[144] (low-cut shoe)."""
    img = _canvas()
    d = ImageDraw.Draw(img)
    d.polygon([(3, 16), (10, 10), (17, 10), (25, 16), (25, 21), (3, 21)], fill=220)
    d.polygon([(2, 20), (26, 20), (26, 24), (2, 24)], fill=255)
    # laces
    for x0 in (11, 14, 17):
        d.line([(x0, 11), (x0 + 2, 15)], fill=90, width=1)
    return np.asarray(img, np.uint8)


def digit_one_a() -> np.ndarray:
    """MNIST[3] is a handwritten '1' (slight slant)."""
    img = _canvas()
    d = ImageDraw.Draw(img)
    d.line([(16, 4), (13, 24)], fill=250, width=3)
    d.line([(12, 8), (16, 4)], fill=250, width=2)
    return np.asarray(img, np.uint8)


def digit_one_b() -> np.ndarray:
    """MNIST[6] is another handwritten '1' (straighter, with a base)."""
    img = _canvas()
    d = ImageDraw.Draw(img)
    d.line([(14, 3), (14, 23)], fill=255, width=3)
    d.line([(10, 23), (19, 23)], fill=255, width=2)
    d.line([(11, 7), (14, 3)], fill=255, width=2)
    return np.asarray(img, np.uint8)


GLYPHS = {
    "fashion_0": ankle_boot,
    "fashion_144": sneaker,
    "mnist_3": digit_one_a,
    "mnist_6": digit_one_b,
}


def main() -> None:
    import hashlib
    import json

    os.makedirs(OUT, exist_ok=True)
    hashes = {}
    for name, fn in GLYPHS.items():
        arr = fn()
        assert arr.shape == (28, 28) and arr.dtype == np.uint8
        path = os.path.join(OUT, f"{name}.npy")
        np.save(path, arr)
        with open(path, "rb") as f:
            hashes[f"{name}.npy"] = hashlib.sha1(f.read()).hexdigest()
        print(f"wrote {name}.npy  nonzero={int((arr > 0).sum())}")
    # Manifest of known STAND-IN hashes: core/poison.py warns once when a
    # loaded glyph matches (i.e. it is a hand-drawn stand-in, not a real
    # (Fashion)MNIST export the user dropped in).
    with open(os.path.join(OUT, "standins.json"), "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print("wrote standins.json")


if __name__ == "__main__":
    main()
