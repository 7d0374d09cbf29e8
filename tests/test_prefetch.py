"""Host-side prefetch iterator (utils/prefetch.py)."""

import threading
import time

import pytest

from villandiffusion_tpu.utils.prefetch import prefetch


class TestPrefetch:
    def test_order_and_transform(self):
        got = list(prefetch(range(20), depth=3, transform=lambda x: x * 2))
        assert got == [2 * i for i in range(20)]

    def test_depth_zero_is_synchronous(self):
        got = list(prefetch(range(5), depth=0, transform=lambda x: x + 1))
        assert got == [1, 2, 3, 4, 5]

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_early_break_stops_worker(self):
        """Abandoning the consumer mid-epoch (the train loop's
        max_train_steps break) must not leak a blocked worker thread."""
        before = {t.name for t in threading.enumerate()}

        def slow_gen():
            for i in range(1000):
                yield i

        it = prefetch(slow_gen(), depth=2)
        assert next(it) == 0
        it.close()  # generator finalization -> stop event
        deadline = time.time() + 5.0
        while time.time() < deadline:
            workers = [
                t for t in threading.enumerate()
                if t.name == "villan-prefetch" and t.name not in before
            ]
            if not any(t.is_alive() for t in workers):
                break
            time.sleep(0.05)
        assert not any(
            t.is_alive() for t in threading.enumerate()
            if t.name == "villan-prefetch"
        )

    def test_overlap_actually_happens(self):
        """Producer work overlaps consumer work: total wall < serial sum."""
        def gen():
            for i in range(8):
                time.sleep(0.02)
                yield i

        t0 = time.time()
        for _ in prefetch(gen(), depth=2):
            time.sleep(0.02)
        overlapped = time.time() - t0
        assert overlapped < 8 * 0.04 * 0.9, overlapped
