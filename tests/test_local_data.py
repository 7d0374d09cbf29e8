"""Local-files dataset ingestion (data/local.py): every supported layout,
plus the DatasetLoader / CaptionDatasetLoader integration.

Reference surfaces replaced: HF load_dataset calls at
/root/reference/dataset.py:111-128 and caption_dataset.py:118-142, and the
CelebA-HQ-Dialog raw-layout prepare at caption_dataset.py:1298-1355.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from villandiffusion_tpu.data import local as LF


def _imgs(n, size=16, channel=3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, size, size, channel)) * 255).astype(np.uint8)


class TestLayouts:
    def test_npz_with_captions_and_labels(self, tmp_path):
        base = str(tmp_path / "ds")
        np.savez(
            base + ".npz",
            images=_imgs(6),
            captions=np.array([f"cap {i}" for i in range(6)]),
            labels=np.arange(6, dtype=np.float32),
        )
        imgs, caps, labels = LF.load_images_and_captions(base, 16, 3)
        assert imgs.shape == (6, 16, 16, 3)
        assert caps == [f"cap {i}" for i in range(6)]
        assert labels.tolist() == list(range(6))

    def test_npy_images_only(self, tmp_path):
        base = str(tmp_path / "ds")
        np.save(base + ".npy", _imgs(4))
        imgs, caps, labels = LF.load_images_and_captions(base, 16, 3)
        assert imgs.shape == (4, 16, 16, 3)
        assert caps is None and labels is None

    def test_imagefolder_with_metadata_jsonl(self, tmp_path):
        base = tmp_path / "ds"
        base.mkdir()
        src = _imgs(5)
        rows = []
        for i in range(5):
            Image.fromarray(src[i]).save(base / f"{i}.png")
            rows.append({"file_name": f"{i}.png", "text": f"a photo {i}", "label": i % 2})
        with open(base / "metadata.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        imgs, caps, labels = LF.load_images_and_captions(str(base), 16, 3)
        assert imgs.shape == (5, 16, 16, 3)
        assert caps[3] == "a photo 3"
        assert labels.tolist() == [0, 1, 0, 1, 0]

    def test_plain_image_dir_recursive(self, tmp_path):
        base = tmp_path / "ds"
        (base / "sub").mkdir(parents=True)
        src = _imgs(3, size=20)
        Image.fromarray(src[0]).save(base / "a.jpg")
        Image.fromarray(src[1]).save(base / "sub" / "b.png")
        Image.fromarray(src[2]).save(base / "c.webp")
        imgs, caps, labels = LF.load_images_and_captions(str(base), 16, 3)
        assert imgs.shape == (3, 16, 16, 3)  # resized from 20px
        assert caps is None

    def test_parquet_with_image_bytes(self, tmp_path):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = tmp_path / "ds"
        base.mkdir()
        src = _imgs(4)
        cells = []
        for i in range(4):
            buf = io.BytesIO()
            Image.fromarray(src[i]).save(buf, format="PNG")
            cells.append({"bytes": buf.getvalue(), "path": None})
        table = pa.table(
            {
                "image": cells,
                "text": [f"pokemon {i}" for i in range(4)],
                "label": list(range(4)),
            }
        )
        pq.write_table(table, base / "part-0.parquet")
        imgs, caps, labels = LF.load_images_and_captions(str(base), 16, 3)
        assert imgs.shape == (4, 16, 16, 3)
        assert caps == [f"pokemon {i}" for i in range(4)]
        np.testing.assert_array_equal(imgs[2], src[2])

    def test_arrow_save_to_disk(self, tmp_path):
        import datasets as hfds

        base = str(tmp_path / "ds")
        src = _imgs(3)
        ds = hfds.Dataset.from_dict(
            {
                "image": [Image.fromarray(src[i]) for i in range(3)],
                "text": [f"t{i}" for i in range(3)],
            }
        )
        ds.save_to_disk(base)
        imgs, caps, labels = LF.load_images_and_captions(base, 16, 3)
        assert imgs.shape == (3, 16, 16, 3)
        assert caps == ["t0", "t1", "t2"]

    def test_celeba_hq_dialog_raw_layout(self, tmp_path):
        base = tmp_path / "CelebA-HQ-Dialog"
        (base / "train" / "image").mkdir(parents=True)
        (base / "text").mkdir()
        src = _imgs(3)
        names = ["0.jpg", "1.jpg", "5380.jpg"]
        for i, nm in enumerate(names):
            Image.fromarray(src[i]).save(base / "train" / "image" / nm)
        # 5380.jpg deliberately missing from the json (reference fill-up,
        # caption_dataset.py:1319-1330)
        caps = {
            "0.jpg": {"overall_caption": "a face"},
            "1.jpg": {"overall_caption": "another face"},
        }
        with open(base / "text" / "captions_hq.json", "w") as f:
            json.dump(caps, f)
        imgs, captions, _ = LF.load_images_and_captions(str(base), 16, 3)
        assert imgs.shape == (3, 16, 16, 3)
        assert "teenager" in " ".join(captions)  # filled-up 5380 caption

    def test_mmap_cache_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setattr(LF, "_MMAP_THRESHOLD_BYTES", 1)
        monkeypatch.setenv("VILLAN_CACHE", str(tmp_path / "cache"))
        base = str(tmp_path / "ds")
        np.savez(base + ".npz", images=_imgs(4), captions=np.array(["a", "b", "c", "d"]))
        imgs1, caps1, _ = LF.load_images_and_captions(base, 16, 3)
        assert isinstance(imgs1, np.memmap)
        # second load hits the cache (delete source to prove it)
        os.remove(base + ".npz")
        imgs2, caps2, _ = LF.load_images_and_captions(base, 16, 3)
        np.testing.assert_array_equal(np.asarray(imgs1), np.asarray(imgs2))
        assert caps1 == caps2

    def test_limit(self, tmp_path):
        base = str(tmp_path / "ds")
        np.save(base + ".npy", _imgs(10))
        imgs, _, _ = LF.load_images_and_captions(base, 16, 3, limit=4)
        assert len(imgs) == 4

    def test_cache_invalidated_on_source_edit(self, tmp_path, monkeypatch):
        monkeypatch.setattr(LF, "_MMAP_THRESHOLD_BYTES", 1)
        monkeypatch.setenv("VILLAN_CACHE", str(tmp_path / "cache"))
        base = str(tmp_path / "ds")
        np.savez(base + ".npz", images=_imgs(4, seed=0))
        imgs1, _, _ = LF.load_images_and_captions(base, 16, 3)
        first = np.asarray(imgs1).copy()
        # rewrite the source with different pixels (and a different mtime)
        os.remove(base + ".npz")
        np.savez(base + ".npz", images=_imgs(4, seed=7))
        os.utime(base + ".npz", (0, 0))
        imgs2, _, _ = LF.load_images_and_captions(base, 16, 3)
        assert not np.array_equal(first, np.asarray(imgs2))

    def test_cache_without_sidecar_is_regenerated(self, tmp_path, monkeypatch):
        monkeypatch.setattr(LF, "_MMAP_THRESHOLD_BYTES", 1)
        cache_dir = tmp_path / "cache"
        monkeypatch.setenv("VILLAN_CACHE", str(cache_dir))
        base = str(tmp_path / "ds")
        caps = np.array(["a", "b", "c", "d"])
        np.savez(base + ".npz", images=_imgs(4), captions=caps)
        _, caps1, _ = LF.load_images_and_captions(base, 16, 3)
        # simulate a crash between the npy and sidecar publications
        sidecars = [f for f in os.listdir(cache_dir) if f.endswith(".json")]
        assert sidecars, "sidecar must be written for a valid cache"
        for f in sidecars:
            os.remove(cache_dir / f)
        _, caps2, _ = LF.load_images_and_captions(base, 16, 3)
        assert caps2 == caps1 == list(caps)

    def test_captions_only_never_decodes_images(self, tmp_path, monkeypatch):
        """load_captions_only reads caption metadata without opening a
        single image file (the OUT-dist prompt path)."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        # imagefolder + metadata.jsonl
        base = tmp_path / "ds"
        base.mkdir()
        src = _imgs(4)
        rows = []
        for i in range(4):
            Image.fromarray(src[i]).save(base / f"{i}.png")
            rows.append({"file_name": f"{i}.png", "text": f"cap {i}"})
        with open(base / "metadata.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # decoding an image must not happen: poison every image file
        for i in range(4):
            (base / f"{i}.png").write_bytes(b"not a png")
        assert LF.load_captions_only(str(base)) == [f"cap {i}" for i in range(4)]

        # parquet: only the text column is touched
        pbase = tmp_path / "pds"
        pbase.mkdir()
        cells = []
        for i in range(3):
            buf = io.BytesIO()
            Image.fromarray(src[i]).save(buf, format="PNG")
            cells.append({"bytes": buf.getvalue(), "path": None})
        pq.write_table(
            pa.table({"image": cells, "text": [f"p {i}" for i in range(3)]}),
            pbase / "part-0.parquet",
        )
        assert LF.load_captions_only(str(pbase)) == ["p 0", "p 1", "p 2"]

        # npz with captions
        nbase = str(tmp_path / "nds")
        np.savez(nbase + ".npz", images=_imgs(3),
                 captions=np.array(["x", "y", "z"]))
        assert LF.load_captions_only(nbase) == ["x", "y", "z"]
        # and captionless sources report None
        mbase = str(tmp_path / "mds")
        np.save(mbase + ".npy", _imgs(2))
        assert LF.load_captions_only(mbase) is None

    def test_regeneration_crash_window_is_fail_safe(self, tmp_path, monkeypatch):
        """Crash between the .npy and sidecar renames during REgeneration
        leaves new-.npy + old-sidecar; the stale fingerprint must force a
        regenerate (with sidecar-first publication this window silently
        served stale images forever)."""
        monkeypatch.setattr(LF, "_MMAP_THRESHOLD_BYTES", 1)
        cache_dir = tmp_path / "cache"
        monkeypatch.setenv("VILLAN_CACHE", str(cache_dir))
        base = str(tmp_path / "ds")
        np.savez(base + ".npz", images=_imgs(4, seed=0))
        LF.load_images_and_captions(base, 16, 3)
        # source changes...
        os.remove(base + ".npz")
        np.savez(base + ".npz", images=_imgs(4, seed=7))
        os.utime(base + ".npz", (0, 0))
        # ...and the regeneration "crashed" right after the .npy rename:
        # overwrite the cached npy with garbage, keep the OLD sidecar
        (npy,) = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
        garbage = np.zeros((4, 16, 16, 3), np.uint8)
        np.save(str(cache_dir / npy)[:-4], garbage)
        imgs, _, _ = LF.load_images_and_captions(base, 16, 3)
        assert not np.array_equal(np.asarray(imgs), garbage)

    def test_legacy_sidecar_without_fingerprint_is_stale(self, tmp_path, monkeypatch):
        monkeypatch.setattr(LF, "_MMAP_THRESHOLD_BYTES", 1)
        cache_dir = tmp_path / "cache"
        monkeypatch.setenv("VILLAN_CACHE", str(cache_dir))
        base = str(tmp_path / "ds")
        np.savez(base + ".npz", images=_imgs(4, seed=0))
        LF.load_images_and_captions(base, 16, 3)
        import json as _json

        (sc,) = [f for f in os.listdir(cache_dir) if f.endswith(".json")]
        with open(cache_dir / sc) as f:
            side = _json.load(f)
        assert side.pop("fingerprint", None) is not None
        with open(cache_dir / sc, "w") as f:
            _json.dump(side, f)
        # poison the npy to detect whether it was served or regenerated
        (npy,) = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
        garbage = np.zeros((4, 16, 16, 3), np.uint8)
        np.save(str(cache_dir / npy)[:-4], garbage)
        imgs, _, _ = LF.load_images_and_captions(base, 16, 3)
        assert not np.array_equal(np.asarray(imgs), garbage)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            LF.resolve(str(tmp_path / "nope"))


class TestLoaderIntegration:
    def test_cifar10_local_with_label_filter(self, tmp_path):
        from villandiffusion_tpu.data import loader as L

        root = tmp_path / "datasets"
        root.mkdir()
        np.savez(
            root / "cifar10.npz",
            images=_imgs(20, size=32),
            labels=np.array([i % 4 for i in range(20)], np.float32),
        )
        dsl = L.DatasetLoader("CIFAR10", root=str(root), label=[1, 2])
        assert len(dsl.images) == 10
        dsl.set_poison("BOX_14", "CORNER", poison_rate=0.5).prepare_dataset()
        batch = next(iter(dsl.get_dataloader(batch_size=4)))
        assert batch[L.LABEL].min() >= 1 and batch[L.LABEL].max() <= 2

    def test_celeba_hq_local_imagefolder(self, tmp_path):
        from villandiffusion_tpu.data import loader as L

        root = tmp_path / "datasets"
        d = root / "celeba_hq_256"
        d.mkdir(parents=True)
        src = _imgs(4, size=32)
        for i in range(4):
            Image.fromarray(src[i]).save(d / f"{i}.png")
        dsl = L.DatasetLoader("CELEBA-HQ", root=str(root), image_size=32)
        assert dsl.images.shape == (4, 32, 32, 3)

    def test_pokemon_caption_local(self, tmp_path):
        from villandiffusion_tpu.data import caption_loader as CL

        root = tmp_path / "datasets"
        d = root / "pokemon-blip-captions"
        d.mkdir(parents=True)
        src = _imgs(6, size=16)
        rows = []
        for i in range(6):
            Image.fromarray(src[i]).save(d / f"{i}.png")
            rows.append({"file_name": f"{i}.png", "text": f"a {i} pokemon"})
        with open(d / "metadata.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        dsl = CL.CaptionDatasetLoader(
            "POKEMON-CAPTION", image_size=16, batch_size=2, root=str(root)
        )
        dsl.set_poison(
            image_trigger=None, caption_trigger="TRIGGER_SKS",
            target="CORNER", poison_rate=0.5,
        )
        batch = next(iter(dsl.get_dataloader(batch_size=2)))
        assert batch[CL.RAW].shape == (2, 16, 16, 3)
        assert len(batch[CL.CAPTION]) == 2
        # poisoned captions carry the trigger token
        for cap, p in zip(batch[CL.CAPTION], batch["is_poison"]):
            assert ("sks" in cap) == bool(p) or not p

    def test_laion_coco_requires_local(self, tmp_path):
        from villandiffusion_tpu.data import caption_loader as CL

        with pytest.raises(NotImplementedError):
            CL.CaptionDatasetLoader(
                "LAION-COCO", image_size=16, root=str(tmp_path)
            )
