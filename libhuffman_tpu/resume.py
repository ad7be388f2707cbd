"""Block-aligned checkpoint / resume (SURVEY.md §5.4).

The reference has no checkpointing, but its format makes every block
boundary a natural resume point: blocks are fully self-contained (own
header, own tree, own zero-padded bitstream — src/encoder.c:288-374) and
the decoder's only inter-block state is a byte counter
(``have_been_processed``, src/decoder.c:218).  This module exposes that
resumability explicitly:

  * ``encode_range``   — encode only blocks [start, stop) of the input; the
                         concatenation over a partition of the block range
                         is byte-identical to a whole-stream encode, so an
                         interrupted encode resumes at the next block index.
  * ``block_offsets``  — byte offset of every block header in a compressed
                         stream (one sequential scan, native-accelerated).
  * ``decode_from_block`` — decode a compressed stream starting at block k,
                         skipping (without decoding) everything before it.

Used together: a long job checkpoints ``(block_index, bytes_written)`` and
resumes both directions exactly, with no re-work and no format extensions.
"""

from __future__ import annotations

import numpy as np

from . import native
from .format import DEFAULT_BLOCK_SIZE, parse_block_header
from .ops import hostref


def n_blocks(data_len: int, blocksize: int = DEFAULT_BLOCK_SIZE) -> int:
    """Number of blocks a whole-stream encode of ``data_len`` bytes emits."""
    if data_len == 0:
        return 0
    if blocksize <= 0:
        return 1
    return -(-data_len // blocksize)


def encode_range(
    data: bytes | np.ndarray,
    blocksize: int = DEFAULT_BLOCK_SIZE,
    start_block: int = 0,
    stop_block: int | None = None,
) -> bytes:
    """Encode blocks [start_block, stop_block) of ``data``.

    Concatenating the outputs of any partition of ``range(n_blocks(...))``
    reproduces ``encode.encode(data, blocksize)`` byte-for-byte, because
    blocks are independent (per-block histogram/tree/padding reset,
    src/encoder.c:353-373).
    """
    from . import encode as enc_mod

    buf = (
        np.frombuffer(data, dtype=np.uint8)
        if isinstance(data, (bytes, bytearray, memoryview))
        else np.asarray(data, dtype=np.uint8)
    )
    total = n_blocks(len(buf), blocksize)
    if blocksize <= 0:
        blocksize = len(buf)
    if stop_block is None or stop_block > total:
        stop_block = total
    start_block = max(0, start_block)
    if start_block >= stop_block:
        return b""
    seg = buf[start_block * blocksize : stop_block * blocksize]
    return enc_mod.encode(seg, blocksize)


def block_offsets(stream: bytes, length: int | None = None) -> list[int]:
    """Byte offset of each block header in ``stream`` (offsets[k] = start of
    block k); raises like ``decode`` on a corrupt/truncated chain."""
    from .errors import (
        BtreeCorruptedError,
        BtreeOverflowError,
        ReadWriteError,
    )

    if length is None:
        length = len(stream)
    buf = np.frombuffer(stream, dtype=np.uint8)[:length]
    offs: list[int] = []
    off = 0
    mv = memoryview(stream)
    while off < length:
        offs.append(off)
        if native.available():
            err, consumed, _produced, _blocks, _ = native.scan_stream(
                buf[off:length], decode=False, max_blocks=1
            )
            if err == 3:
                raise ReadWriteError("Failed to decode the data")
            if err == 5:
                raise BtreeOverflowError("Failed to decode the data")
            if err == 6:
                raise BtreeCorruptedError("Failed to decode the data")
            off += consumed
        else:
            hdr = parse_block_header(mv, off)
            _syms, consumed = hostref.decode_block_payload(
                hdr.tree, buf[hdr.payload_off : length], hdr.n_sym
            )
            off = hdr.payload_off + consumed
    return offs


def decode_from_block(
    stream: bytes,
    start_block: int,
    stop_block: int | None = None,
    length: int | None = None,
) -> bytes:
    """Decode blocks [start_block, stop_block) of a compressed stream.

    Blocks before ``start_block`` are chain-scanned (headers + payload
    lengths) but not materialized; decode itself runs on the device path.
    """
    from . import decode as dec_mod

    offs = block_offsets(stream, length)
    if start_block >= len(offs):
        return b""
    if length is None:
        length = len(stream)
    end = length if stop_block is None or stop_block >= len(offs) else offs[stop_block]
    return dec_mod.decode(stream[offs[start_block] : end])
