"""Native C++ PNG codec: round-trip + PIL interop + samples.py wiring."""

import os

import numpy as np
import pytest
from PIL import Image

from villandiffusion_tpu import native
from villandiffusion_tpu.utils import samples


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native imageio lib unavailable"
)


@needs_native
def test_write_read_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 17, 23, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(5)]
    assert native.write_png_batch(paths, imgs)
    assert native.png_info(paths[0]) == (17, 23, 3)
    back = native.read_png_batch(paths, 17, 23, 3)
    np.testing.assert_array_equal(back, imgs)


@needs_native
def test_native_png_readable_by_pil(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    assert native.write_png_batch([p], img)
    via_pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(via_pil, img[0])


@needs_native
def test_native_reads_pil_png(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    p = str(tmp_path / "pil.png")
    Image.fromarray(img).save(p)
    back = native.read_png_batch([p], 16, 16, 3)
    np.testing.assert_array_equal(back[0], img)


@needs_native
def test_grayscale_roundtrip_and_conversion(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1, 8, 8, 1), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    assert native.write_png_batch([p], img)
    assert native.png_info(p) == (8, 8, 1)
    rgb = native.read_png_batch([p], 8, 8, 3)
    np.testing.assert_array_equal(rgb[0], np.repeat(img[0], 3, axis=-1))


def test_samples_save_load_uses_native_or_falls_back(tmp_path):
    rng = np.random.default_rng(4)
    imgs = rng.random((6, 12, 12, 3)).astype(np.float32)
    d = str(tmp_path / "out")
    samples.save_images(imgs, d)
    assert samples.match_count(d) == 6
    back = samples.load_images(d)
    np.testing.assert_allclose(back, samples.to_uint8(imgs) / 255.0, atol=1e-6)


@needs_native
def test_dimension_mismatch_rejected(tmp_path):
    img = np.zeros((1, 8, 8, 3), np.uint8)
    p = str(tmp_path / "d.png")
    assert native.write_png_batch([p], img)
    assert native.read_png_batch([p], 9, 8, 3) is None
