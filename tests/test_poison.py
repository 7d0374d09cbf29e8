"""Shape/range/semantics tests for trigger rasterizers and the poisoned
dataset pipeline (reference behavior: /root/reference/dataset.py)."""

import numpy as np
import pytest

from villandiffusion_tpu.core import poison as P
from villandiffusion_tpu.data import loader as L


class TestTriggers:
    def test_box_14_geometry(self):
        t = P.get_trigger("BOX_14", channel=3, image_size=32, vmin=-1, vmax=1)
        assert t.shape == (32, 32, 3)
        # grey box bottom-right with 2px gap: rows/cols 16..29 inclusive
        assert np.all(t[16:30, 16:30, :] == 0.0)  # (vmin+vmax)/2
        assert np.all(t[:16, :, :] == -1.0)
        assert np.all(t[:, :, :][30:, :, :] == -1.0)

    def test_white_box(self):
        t = P.get_trigger("SM_BOX", channel=3, image_size=32, vmin=-1, vmax=1)
        assert np.all(t[16:30, 16:30, :] == 1.0)

    def test_box_sizes(self):
        for name, sz in [("BOX_18", 18), ("BOX_11", 11), ("BOX_8", 8), ("BOX_4", 4)]:
            t = P.get_trigger(name, channel=3, image_size=32, vmin=-1, vmax=1)
            stamped = (t > -1).sum() / 3
            assert stamped == sz * sz, name

    def test_none_trigger(self):
        t = P.get_trigger("NONE", channel=3, image_size=32, vmin=-1, vmax=1)
        assert np.all(t == -1.0)

    def test_stop_sign_trigger(self):
        t = P.get_trigger("STOP_SIGN_14", channel=3, image_size=32, vmin=-1, vmax=1)
        assert t.shape == (32, 32, 3)
        assert t.min() >= -1 and t.max() <= 1
        # art occupies the bottom-right 14x14 block (offset -2): some pixels lit
        assert (t > -1).any()
        assert np.all(t[:16, :16, :] == -1.0)

    def test_glasses_trigger_centered(self):
        t = P.get_trigger("GLASSES", channel=3, image_size=64, vmin=0, vmax=1)
        assert t.shape == (64, 64, 3)
        assert (t > 0).any()

    def test_ve_range(self):
        t = P.get_trigger("BOX_14", channel=3, image_size=32, vmin=0, vmax=1)
        assert np.all(t[16:30, 16:30, :] == 0.5)
        assert np.all(t[:16, :, :] == 0.0)

    def test_mnist_family_triggers(self):
        # vendored glyph assets (static/glyphs/*.npy, tools/make_glyphs.py)
        for name in ("MNIST", "MNIST_EZ", "FASHION", "FASHION_EZ"):
            t = P.get_trigger(name, channel=3, image_size=32, vmin=-1, vmax=1)
            assert t.shape == (32, 32, 3)
            assert t.min() == -1.0  # bg2black snaps background to vmin
            assert (t > -1).any()  # glyph pixels survive

    def test_mnist_trigger_single_channel(self):
        t = P.get_trigger("MNIST", channel=1, image_size=28, vmin=0, vmax=1)
        assert t.shape == (28, 28, 1)
        assert t.min() == 0.0

    def test_standin_glyph_warns_once(self, monkeypatch):
        from unittest import mock

        from villandiffusion_tpu.utils.log import Log

        monkeypatch.setattr(P, "_warned_standins", set())
        with mock.patch.object(Log, "warning") as warn:
            P.get_trigger("MNIST", channel=3, image_size=32, vmin=-1, vmax=1)
            assert warn.call_count == 1
            assert "STAND-IN" in warn.call_args[0][0]
            P.get_trigger("MNIST", channel=3, image_size=32, vmin=-1, vmax=1)
            assert warn.call_count == 1  # once per glyph, not per load


class TestTargets:
    def _trig(self):
        return P.get_trigger("BOX_14", channel=3, image_size=32, vmin=-1, vmax=1)

    def test_noshift_is_greyfloored_trigger(self):
        trig = self._trig()
        tgt = P.get_target("NOSHIFT", trig, vmin=-1, vmax=1)
        thres = 2 * 0.3 - 1
        assert tgt.min() == pytest.approx(thres)
        assert np.all(tgt >= thres)

    def test_shift_rolls(self):
        trig = self._trig()
        t0 = P.get_target("NOSHIFT", trig, vmin=-1, vmax=1)
        ts = P.get_target("SHIFT", trig, dx=-5, dy=-3, vmin=-1, vmax=1)
        assert np.allclose(np.roll(np.roll(t0, -3, axis=0), -5, axis=1), ts)

    def test_shoe_target(self):
        trig = self._trig()
        tgt = P.get_target("SHOE", trig, vmin=-1, vmax=1)
        assert tgt.shape == trig.shape
        thres = 2 * 0.3 - 1
        assert tgt.min() == pytest.approx(thres)  # bg2grey floor
        assert (tgt > thres).any()

    def test_corner_box(self):
        tgt = P.get_target("CORNER", self._trig(), vmin=-1, vmax=1)
        assert np.all(tgt[:10, :10, :] == 0.0)
        thres = 2 * 0.3 - 1
        assert np.all(tgt[12:, 12:, :] == pytest.approx(thres))

    def test_hat_cat_targets(self):
        for name in ["BWHAT", "HAT", "CAT"]:
            tgt = P.get_target(name, self._trig(), vmin=-1, vmax=1)
            assert tgt.shape == (32, 32, 3)
            assert tgt.min() >= 2 * 0.3 - 1 - 1e-6
            assert tgt.max() <= 1.0


class TestPoisonBlit:
    def test_mask_blit(self):
        trig = P.get_trigger("BOX_14", channel=3, image_size=32, vmin=-1, vmax=1)
        imgs = np.full((4, 32, 32, 3), 0.25, dtype=np.float32)
        out = P.poison_images(imgs, trig, vmin=-1)
        assert np.all(out[:, 16:30, 16:30, :] == 0.0)   # trigger stamped
        assert np.all(out[:, :16, :, :] == 0.25)        # image shows through

    def test_inpaint_box(self):
        imgs = np.full((2, 32, 32, 3), 0.5, dtype=np.float32)
        imgs[0, 0, 0, 0] = -1.0  # make min well-defined
        out = P.inpaint_by_type(imgs, P.INPAINT_BOX)
        assert np.all(out[:, 11:21, 11:21, :] == -1.0)
        assert out[1, 0, 1, 0] == 0.5


class TestDatasetLoader:
    def _dsl(self, poison_rate=0.5, mode=L.MODE_FIXED, **kw):
        return (
            L.DatasetLoader(L.FAKE32, batch_size=16, seed=0, num_fake=64)
            .set_poison("BOX_14", "CORNER", poison_rate=poison_rate, **kw)
            .prepare_dataset(mode=mode)
        )

    def test_fixed_split_counts(self):
        dsl = self._dsl(poison_rate=0.25)
        assert len(dsl) == 64
        assert (~dsl._entries.is_clean).sum() == 16

    def test_batch_contract(self):
        dsl = self._dsl()
        batch = next(iter(dsl.get_dataloader(batch_size=16)))
        for key in [L.IMAGE, L.PIXEL_VALUES, L.TARGET, L.TRIGGER, L.PIXEL_VALUES_TRIGGER]:
            assert batch[key].shape == (16, 32, 32, 3), key
            assert batch[key].dtype == np.float32
        assert batch[L.IS_CLEAN].dtype == bool

    def test_clean_examples(self):
        dsl = self._dsl(poison_rate=0.0)
        batch = next(iter(dsl.get_dataloader(batch_size=16)))
        assert np.all(batch[L.IS_CLEAN])
        assert np.all(batch[L.PIXEL_VALUES] == 0)
        assert np.allclose(batch[L.TARGET], batch[L.IMAGE])

    def test_poisoned_examples(self):
        dsl = self._dsl(poison_rate=1.0)
        batch = next(iter(dsl.get_dataloader(batch_size=16)))
        assert not np.any(batch[L.IS_CLEAN])
        # target is the CORNER target for every example
        assert np.allclose(batch[L.TARGET][0], batch[L.TARGET][1])
        assert np.all(batch[L.TARGET][:, :10, :10, :] == 0.0)
        # R = blitted image: trigger region stamped
        assert np.all(batch[L.PIXEL_VALUES][:, 16:30, 16:30, :] == 0.0)
        # image region of R varies per example (not trigger-only)
        assert not np.allclose(batch[L.PIXEL_VALUES][0, :16], batch[L.PIXEL_VALUES][1, :16])

    def test_r_trigger_only(self):
        dsl = (
            L.DatasetLoader(L.FAKE32, batch_size=16, seed=0, num_fake=64)
            .set_poison("BOX_14", "CORNER", poison_rate=1.0)
            .prepare_dataset(mode=L.MODE_FIXED, R_trigger_only=True)
        )
        batch = next(iter(dsl.get_dataloader(batch_size=16)))
        # R is exactly the trigger for every example
        assert np.allclose(batch[L.PIXEL_VALUES], batch[L.TRIGGER])

    def test_extend_mode_grows(self):
        dsl = (
            L.DatasetLoader(L.FAKE32, batch_size=16, seed=0, num_fake=64)
            .set_poison("BOX_14", "CORNER", poison_rate=0.5, ext_poison_rate=0.25)
            .prepare_dataset(mode=L.MODE_EXTEND)
        )
        # 64 base (48 clean + 16 ext-poison) + 32 extra poison
        assert len(dsl) == 96
        assert (~dsl._entries.is_clean).sum() == 48

    def test_flex_mode(self):
        dsl = (
            L.DatasetLoader(L.FAKE32, batch_size=16, seed=0, num_fake=64)
            .set_poison("BOX_14", "CORNER", clean_rate=0.5, poison_rate=0.25)
            .prepare_dataset(mode=L.MODE_FLEX)
        )
        assert len(dsl) == 48
        assert (~dsl._entries.is_clean).sum() == 16

    def test_deterministic_split(self):
        a = self._dsl()._entries
        b = self._dsl()._entries
        assert np.array_equal(a.src, b.src)

    def test_value_range(self):
        dsl = self._dsl()
        batch = next(iter(dsl.get_dataloader(batch_size=16)))
        assert batch[L.IMAGE].min() >= -1.0 and batch[L.IMAGE].max() <= 1.0


def test_device_materializer_matches_host_pipeline():
    """The device-side (jit) poisoner fed by get_raw_dataloader must produce
    exactly the {target, pixel_values} the host materializer produces for the
    same epoch seed (same shuffle + flip RNG stream)."""
    import jax

    from villandiffusion_tpu.core import poison as P
    from villandiffusion_tpu.data import loader as L

    dsl = (
        L.DatasetLoader(L.FAKE32, num_fake=64, batch_size=16, seed=3)
        .set_poison("BOX_14", "CORNER", poison_rate=0.4)
        .prepare_dataset(mode="FIXED", R_trigger_only=False)
    )
    mat = jax.jit(
        P.make_device_materializer(dsl.trigger, dsl.target, dsl.vmin, dsl.vmax)
    )
    host = list(dsl.get_dataloader(epoch_seed=7))
    raw = list(dsl.get_raw_dataloader(epoch_seed=7))
    assert len(host) == len(raw) == 4
    for hb, rb in zip(host, raw):
        db = mat(rb)
        np.testing.assert_allclose(
            np.asarray(db["target"]), hb[L.TARGET], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(db["pixel_values"]), hb[L.PIXEL_VALUES], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(db["image"]), hb[L.IMAGE], atol=1e-6)
