"""Histogram iota/start/accumulate/reset parity (mirrors test/histogram_test.c)."""

import numpy as np
import pytest

from libhuffman_tpu.errors import InvalidArgumentError
from libhuffman_tpu.histogram import Histogram


def u32(*vals) -> bytes:
    return np.asarray(vals, "<u4").tobytes()


def test_allocation():
    # test/histogram_test.c:11-27
    h = Histogram(2, 10)
    assert h.iota == 2
    assert h.length == 10
    assert h.start == -1
    assert (h.frequencies == 0).all()


def test_populate_accumulates():
    # test/histogram_test.c:31-60 (iota=4, two populates accumulate)
    h = Histogram(4, 10)
    h.populate(u32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9))
    assert h.start == 0
    assert (h.frequencies == 1).all()
    h.populate(u32(0, 0, 1, 1, 8, 8, 8, 8))
    assert h.start == 0
    assert h.frequencies.tolist() == [3, 3, 1, 1, 1, 1, 1, 1, 5, 1]


def test_single_value():
    # test/histogram_test.c:63-75
    h = Histogram(4, 10)
    h.populate(u32(1, 1, 1, 1, 1))
    assert h.frequencies[1] == 5


def test_start_tracks_minimum():
    # test/histogram_test.c:79-96
    h = Histogram(4, 10)
    h.populate(u32(4, 4, 5, 5, 5, 5, 9))
    assert h.start == 4
    h.populate(u32(1, 1, 1, 8, 8, 8))
    assert h.start == 1


def test_reset():
    # test/histogram_test.c:100-135
    h = Histogram(4, 10)
    data = u32(3, 3, 3, 3, 6, 7, 7, 1, 1, 2, 7, 7)
    rates = [0, 2, 1, 4, 0, 0, 1, 4, 0, 0]
    h.populate(data)
    assert h.start == 1
    assert h.frequencies.tolist() == rates
    h.reset()
    assert h.start == -1
    assert (h.frequencies == 0).all()
    h.populate(data)
    assert h.start == 1
    assert h.frequencies.tolist() == rates


def test_ragged_tail_ignored():
    # src/histogram.c:85-100: the end-pointer loop drops a partial element.
    h = Histogram(4, 10)
    h.populate(u32(2, 2) + b"\x03")
    assert h.frequencies[2] == 2
    assert h.frequencies[3] == 0


def test_invalid_args():
    with pytest.raises(InvalidArgumentError):
        Histogram(0, 10)
    with pytest.raises(InvalidArgumentError):
        Histogram(4, 0)
    h = Histogram(1, 4)
    with pytest.raises(InvalidArgumentError):
        h.populate(b"\x09")  # element value outside [0, length)
