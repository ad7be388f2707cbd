"""Block-aligned checkpoint/resume (SURVEY.md §5.4) and tracing hooks (§5.1).

Every block boundary in the format is a resume point by construction
(self-contained blocks, src/encoder.c:288-374; the decoder's only inter-block
state is a byte counter, src/decoder.c:218).  These tests pin the exposed
APIs to that property.
"""

import numpy as np
import pytest

from libhuffman_tpu import decode as dec_mod
from libhuffman_tpu import encode as enc_mod
from libhuffman_tpu import resume
from libhuffman_tpu.errors import ReadWriteError
from libhuffman_tpu.utils import trace


def _corpus(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(97, 105, n, dtype=np.uint8).tobytes()


def test_encode_range_partition_identity():
    data = _corpus()
    bs = 512
    full = enc_mod.encode(data, bs)
    total = resume.n_blocks(len(data), bs)
    assert total == -(-len(data) // bs)
    # Any partition of the block range concatenates to the full stream.
    parts = [
        resume.encode_range(data, bs, 0, 3),
        resume.encode_range(data, bs, 3, 7),
        resume.encode_range(data, bs, 7, None),
    ]
    assert b"".join(parts) == full
    # Per-block granularity too.
    per_block = b"".join(
        resume.encode_range(data, bs, k, k + 1) for k in range(total)
    )
    assert per_block == full


def test_encode_range_edges():
    data = _corpus(100)
    assert resume.encode_range(data, 64, 5, 5) == b""
    assert resume.encode_range(data, 64, 99, None) == b""
    assert resume.encode_range(b"", 64) == b""
    assert resume.n_blocks(0) == 0
    assert resume.n_blocks(100, 0) == 1  # blocksize 0 = whole input


def test_block_offsets_and_decode_from_block():
    data = _corpus()
    bs = 512
    stream = enc_mod.encode(data, bs)
    offs = resume.block_offsets(stream)
    total = resume.n_blocks(len(data), bs)
    assert len(offs) == total and offs[0] == 0
    assert offs == sorted(offs)
    # Resume decode at any block: output equals the input suffix.
    for k in (0, 1, total // 2, total - 1):
        got = resume.decode_from_block(stream, k)
        assert got == data[k * bs :], k
    # Bounded ranges.
    assert resume.decode_from_block(stream, 2, 5) == data[2 * bs : 5 * bs]
    assert resume.decode_from_block(stream, total, None) == b""


def test_block_offsets_truncated_raises():
    stream = enc_mod.encode(_corpus(600), 256)
    with pytest.raises(ReadWriteError):
        resume.block_offsets(stream[:-1])


def test_trace_timings_and_annotations():
    trace.reset_timings()
    trace.enable_timing(True)
    try:
        data = _corpus(2000)
        stream = enc_mod.encode(data, 512)
        assert dec_mod.decode(stream) == data
        t = trace.get_timings()
        assert "huff.encode.device" in t and len(t["huff.encode.device"]) >= 1
        assert "huff.encode.assemble" in t
        assert all(v >= 0 for vs in t.values() for v in vs)
    finally:
        trace.enable_timing(False)
    trace.reset_timings()
    assert trace.get_timings() == {}


def test_annotate_is_silent_when_disabled():
    trace.reset_timings()
    with trace.annotate("huff.test.span"):
        pass
    assert trace.get_timings() == {}
