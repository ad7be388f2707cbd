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


def _allgather_bytes(local: bytes) -> list[bytes]:
    """Gather one byte string from every process, in process order."""
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    if nproc == 1:
        return [local]
    size = np.asarray([len(local)], np.int64)
    sizes = np.asarray(
        multihost_utils.process_allgather(size)
    ).reshape(nproc)
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[: len(local)] = np.frombuffer(local, np.uint8)
    gathered = np.asarray(
        multihost_utils.process_allgather(padded)
    ).reshape(nproc, cap)
    return [gathered[i, : sizes[i]].tobytes() for i in range(nproc)]


def _my_range(n_items: int) -> tuple[int, int]:
    """Contiguous [lo, hi) item range owned by this process."""
    nproc = jax.process_count()
    pid = jax.process_index()
    per = -(-n_items // nproc)
    lo = min(pid * per, n_items)
    return lo, min(lo + per, n_items)


def encode_stream_multihost(data, blocksize: int, mesh=None) -> bytes:
    """Encode across processes; every process returns the full stream.

    Each process encodes its contiguous block range with the local pipeline
    (optionally sharded over ``mesh`` within the process); per-range
    compressed sizes are all-gathered and the ranges concatenate in rank
    order (their offsets are the exclusive scan of the sizes).
    """
    buf = np.frombuffer(bytes(data), np.uint8)
    n = len(buf)
    if n == 0:
        return b""
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
    cands = _decode_mod.scan_candidates(buf)
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
