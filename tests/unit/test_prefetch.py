"""Prefetch stress tests (SURVEY.md §5 "race detection"): the double buffer
is the framework's one shared-mutable-state site — stress order, backpressure
and error propagation instead of a sanitizer."""
import time

import numpy as np
import pytest

from waymo_2d_tracking_tpu.data.prefetch import DevicePrefetcher, prefetch_to_device


def test_order_preserved_fast_producer_slow_consumer():
    items = [np.full((4,), i, np.int32) for i in range(50)]
    out = []
    for x in prefetch_to_device(items, depth=2):
        time.sleep(0.002)  # slow consumer
        out.append(int(np.asarray(x)[0]))
    assert out == list(range(50)), "frames reordered or dropped"


def test_order_preserved_slow_producer():
    def produce():
        for i in range(20):
            time.sleep(0.002)
            yield np.full((2,), i, np.int32)

    out = [int(np.asarray(x)[0]) for x in prefetch_to_device(produce(), depth=2)]
    assert out == list(range(20))


def test_transform_applied_in_worker():
    items = list(range(10))
    out = [int(np.asarray(x)) for x in prefetch_to_device(
        items, depth=2, transform=lambda i: np.int32(i * 2))]
    assert out == [2 * i for i in range(10)]


def test_producer_exception_propagates():
    def produce():
        yield np.zeros(2)
        raise RuntimeError("decode failed")

    it = prefetch_to_device(produce(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_empty_iterable():
    assert list(prefetch_to_device([], depth=2)) == []


def test_backpressure_bounded_queue():
    """Producer must not run arbitrarily ahead of the consumer."""
    produced = []

    def produce():
        for i in range(100):
            produced.append(i)
            yield np.int32(i)

    it = iter(DevicePrefetcher(produce(), depth=2))
    next(it)
    time.sleep(0.1)  # give the worker time to run ahead if unbounded
    # depth 2 queue + 1 in-flight + 1 consumed -> far less than 100
    assert len(produced) <= 5, f"no backpressure: produced {len(produced)}"
    assert [int(np.asarray(x)) for x in it] == list(range(1, 100))
