"""Multi-host codec: process-parallel encode/decode with ordered assembly.

SURVEY.md §5.8's plan made concrete.  Two layers of parallelism compose:

  * within a host/slice, the block axis shards over local devices through
    ``jax.sharding.Mesh`` (parallel/shard.py) — collectives ride ICI;
  * across hosts, block *ranges* split by process; the only cross-host
    traffic is the all-gather of per-range compressed sizes (tiny, DCN) and
    the final ordered byte gather (``multihost_utils.process_allgather``).

Because every block is self-contained (own header, own tree, byte-aligned —
src/encoder.c:288-374), a contiguous range of blocks encodes to a
self-contained byte string, so ordered concatenation by process rank *is*
the stream: no other coordination exists.  An exclusive scan of the
gathered sizes gives every process its byte offset (the §5.8 recipe).

Usage (one call per process, same arguments everywhere):

    initialize(coordinator_address, num_processes, process_id)  # once
    stream = encode_stream_multihost(data, blocksize)   # same bytes on all
    plain = decode_stream_multihost(stream)             # same bytes on all

Single-process calls degrade to the local pipeline, so the same code runs
unchanged from a laptop to a pod.
"""

from __future__ import annotations

import numpy as np

import jax

from .. import decode as _decode_mod
from .. import encode as _encode_mod


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None, **kwargs) -> None:
    """Bring up the JAX distributed runtime (no-op for a single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id, **kwargs)


# Cross-host traffic accounting (SURVEY.md §5.8: DCN bytes per process
# should scale ~ stream/nproc on the sizes-only paths; tests assert on it).
DCN_BYTES = 0


def _count_dcn(n: int) -> None:
    global DCN_BYTES
    DCN_BYTES += int(n)


def _allgather_sizes(local_size: int) -> np.ndarray:
    """All processes' sizes, in process order (tiny, DCN)."""
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    if nproc == 1:
        return np.asarray([local_size], np.int64)
    _count_dcn(8 * nproc)
    return np.asarray(
        multihost_utils.process_allgather(
            np.asarray([local_size], np.int64))
    ).reshape(nproc)


def _allgather_bytes(local: bytes) -> list[bytes]:
    """Gather one byte string from every process, in process order."""
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    if nproc == 1:
        return [local]
    sizes = _allgather_sizes(len(local))
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[: len(local)] = np.frombuffer(local, np.uint8)
    _count_dcn(cap * nproc)
    gathered = np.asarray(
        multihost_utils.process_allgather(padded)
    ).reshape(nproc, cap)
    return [gathered[i, : sizes[i]].tobytes() for i in range(nproc)]


def _broadcast_bytes(local: bytes) -> bytes:
    """Rank 0's byte string on every process (others contribute nothing)."""
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    if nproc == 1:
        return local
    mine = local if jax.process_index() == 0 else b""
    sizes = _allgather_sizes(len(mine))
    cap = int(sizes[0])
    padded = np.zeros(cap, np.uint8)
    padded[: len(mine)] = np.frombuffer(mine, np.uint8)
    _count_dcn(cap * nproc)
    gathered = np.asarray(
        multihost_utils.process_allgather(padded)
    ).reshape(nproc, cap)
    return gathered[0].tobytes()


def _my_range(n_items: int) -> tuple[int, int]:
    """Contiguous [lo, hi) item range owned by this process."""
    nproc = jax.process_count()
    pid = jax.process_index()
    per = -(-n_items // nproc)
    lo = min(pid * per, n_items)
    return lo, min(lo + per, n_items)


def encode_stream_multihost_local(data, blocksize: int, mesh=None):
    """The §5.8 option-(b) recipe: encode shard-locally, gather SIZES only.

    Each process encodes its contiguous block range with the local pipeline
    and keeps the payload local; the only cross-host traffic is the
    all-gather of per-range compressed sizes (8 bytes/process).  Returns
    ``(local_segment, offset, total_size)`` — the caller writes its segment
    at ``offset`` (shared filesystem, object store, rank-ordered send), and
    the concatenation of segments in rank order IS the stream (every block
    is self-contained and byte-aligned, src/encoder.c:288-374).
    """
    buf = np.frombuffer(bytes(data), np.uint8)
    n = len(buf)
    if n == 0:
        return b"", 0, 0
    bs = blocksize if blocksize > 0 else n
    nblocks = -(-n // bs)
    lo, hi = _my_range(nblocks)
    local_bytes = buf[lo * bs : min(hi * bs, n)].tobytes()
    if mesh is not None and local_bytes:
        from .shard import encode_stream_sharded

        local_stream = encode_stream_sharded(
            np.frombuffer(local_bytes, np.uint8), bs, mesh
        )
    else:
        local_stream = _encode_mod.encode(local_bytes, bs) if local_bytes else b""
    sizes = _allgather_sizes(len(local_stream))
    pid = jax.process_index()
    offset = int(sizes[:pid].sum())
    return local_stream, offset, int(sizes.sum())


def encode_stream_multihost(data, blocksize: int, mesh=None) -> bytes:
    """Encode across processes; every process returns the full stream.

    The sizes-only split (:func:`encode_stream_multihost_local`) plus the
    full-payload all-gather the same-bytes-everywhere contract requires;
    callers who write rank-local segments should use the ``_local`` variant
    directly and skip the payload gather entirely.
    """
    local_stream, _off, total = encode_stream_multihost_local(
        data, blocksize, mesh)
    if total == 0:
        return b""
    return b"".join(_allgather_bytes(local_stream))


def decode_stream_multihost(stream: bytes) -> bytes:
    """Decode across processes; every process returns the full output.

    Block boundaries are only discoverable by decoding (format.py), so the
    stream cannot be pre-split exactly.  Instead each process decodes the
    whole chain but runs the *device* work only for its slice of header
    candidates — on-device compute divides ~evenly while the host-side
    chain walk (cheap) reuses every process's gathered results.  For this
    round the slicing is by candidate ranges; the gathered artifacts are
    (offset, consumed, produced) tables plus the decoded bytes, stitched in
    chain order locally on every process.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return _decode_mod.decode(stream)

    buf = np.frombuffer(stream, np.uint8)
    # Rank 0 runs the vectorized header scan once and broadcasts the
    # candidate offsets; other ranks only re-parse headers at those
    # offsets (identical results by construction — parse_block_header is
    # deterministic on the replicated stream bytes).
    if jax.process_index() == 0:
        cands = _decode_mod.scan_candidates(buf)
        head = np.asarray([c.off for c in cands], np.int64).tobytes()
        head = _broadcast_bytes(head)
    else:
        offs = np.frombuffer(_broadcast_bytes(b""), np.int64)
        cands = _decode_mod.scan_candidates(buf, offsets=offs)
    lo, hi = _my_range(len(cands))
    _decode_mod._decode_candidates_device(buf, cands[lo:hi])

    # Gather (offset, consumed, len(bytes)) + bytes for resolved candidates.
    mine = [(c.off, c.result[1], c.result[0]) for c in cands[lo:hi]
            if c.result is not None]
    head = np.asarray(
        [(o, cns, len(b)) for o, cns, b in mine], np.int64
    ).reshape(-1, 3).tobytes()
    blob = b"".join(b for *_x, b in mine)
    tables = _allgather_bytes(head)
    blobs = _allgather_bytes(blob)

    results: dict[int, tuple[bytes, int]] = {}
    for tbl, bb in zip(tables, blobs):
        rows = np.frombuffer(tbl, np.int64).reshape(-1, 3)
        pos = 0
        for off, cns, ln in rows.tolist():
            results[int(off)] = (bb[pos : pos + ln], int(cns))
            pos += ln

    # Chain walk using the merged result table; gaps fall back to the
    # local exact path (identical on every process).
    out = []
    off = 0
    cand_by_off = {c.off: c for c in cands}
    while off < len(stream):
        hit = results.get(off)
        if hit is not None:
            syms, consumed = hit
            c = cand_by_off[off]
            out.append(syms)
            off = c.payload_off + consumed
            continue
        piece, new_off = _decode_mod.decode_prefix(
            bytes(stream[off:]), use_device=False)
        if new_off == 0:
            # errors propagate with reference semantics
            _decode_mod.decode(bytes(stream[off:]), use_device=False)
            break
        out.append(piece)
        off += new_off
    return b"".join(out)
