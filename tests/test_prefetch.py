"""Background-thread prefetch (utils/prefetch.py): ordering, exception
propagation, laziness bound, and actual overlap."""
import threading
import time

from neurips2023_soc_tpu.utils.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(100)), buffer_size=3)) == list(range(100))


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), buffer_size=2)
    assert next(it) == 1
    try:
        next(it)
        raised = False
    except ValueError as e:
        raised = str(e) == "boom"
    assert raised


def test_buffer_bound():
    """Producer must not run unboundedly ahead of the consumer."""
    produced = []
    done = threading.Event()

    def gen():
        for i in range(100):
            produced.append(i)
            yield i
        done.set()

    it = prefetch(gen(), buffer_size=2)
    next(it)
    time.sleep(0.2)
    # 1 consumed + <= buffer_size queued + <= 1 in-flight put
    assert len(produced) <= 5
    assert not done.is_set()
    list(it)
    assert done.is_set() and produced == list(range(100))


def test_overlap():
    """Producer work overlaps consumer work: total wall time well under the
    serial sum."""
    def gen():
        for _ in range(5):
            time.sleep(0.05)
            yield 1

    t0 = time.time()
    for _ in prefetch(gen(), buffer_size=2):
        time.sleep(0.05)
    elapsed = time.time() - t0
    assert elapsed < 0.45  # serial would be ~0.5s + overhead


def test_buffer_size_zero_passthrough():
    assert list(prefetch(iter([1, 2, 3]), buffer_size=0)) == [1, 2, 3]
