"""Whole-stream encode: host orchestration around the device kernels.

The stream is split into independent fixed-size blocks (the reference's block
loop, src/encoder.c:288-374), batched, and pushed through two jitted stages:

  stage 1  histogram -> tree -> codes -> exact per-block payload bit counts
           (a frequency/length dot product — no per-byte pass), after which
           the host sizes the static word buffer;
  stage 2  per-byte layout + branch-free word packing.

Host work is limited to tree-header serialization and ordered concatenation
of (header, payload) per block.  Batch and word counts are bucketed to keep
the jit cache small.  Blocks whose codes exceed the 32-bit device fast path
(physically impossible below ~2 MB blocks; adversarial only) fall back to the
host-exact codec, preserving bit-exactness unconditionally.
"""

from __future__ import annotations

import numpy as np

from .format import ArrayTree, DEFAULT_BLOCK_SIZE, pack_block, serialize_tree
from . import native
from .ops import device as dev
from .ops import hostref
from .utils.trace import annotate

# Blocks per device sub-batch.  64 KiB x 128 = 8.4 MiB: the round-5 sweep
# (128/256/512/1024 fused to the same total) measured 128-block programs
# ~15% faster per byte than 256 and ~30% faster than 1024 — XLA schedules
# the smaller pipelines better.  Dispatch latency (a flat ~23.5 ms RTT
# that does not pipeline, bench/probe_r4_dispatch.py) amortizes by fusing
# up to FUSE_BATCHES sub-batches into one dispatch
# (ops/device.encode_blocks_many): 48 x 8.4 MiB = one RTT per ~400 MB.
DEFAULT_BATCH_BLOCKS = 128
FUSE_BATCHES = 48


def _bucket(n: int, lo: int) -> int:
    """Round up to a power of two (>= lo) to bound jit-cache size."""
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket_blocks(nb: int) -> int:
    """Batch-size bucket: powers of two to 256, then multiples of 256.

    Pow2-only bucketing wastes up to 2x of device compute at large B (a
    1537-block stream would pad to 2048); multiples of 256 keep padding
    under 17% while the jit-key count stays bounded (<= 8 keys to 2048)."""
    if nb <= 256:
        return _bucket(nb, 1)
    return -(-nb // 256) * 256


def _pack_params(N: int) -> tuple[int, int]:
    """(W, capw) word budget for blocksize N.  capw=24 words per 64-symbol
    chunk covers every block whose mean code length <= 12 bits (text ~4.5,
    incompressible exactly 8); rarer blocks take the host fallback."""
    capw = 24
    P = 1
    while P < N:
        P *= 2
    return min(P, capw * max(P // 64, 1)), capw


def _encode_batch(batch: np.ndarray, n_valid: np.ndarray) -> list[bytes]:
    """Encode a (B, N) uint8 batch; returns per-block wire bytes."""
    import jax.numpy as jnp

    W, capw = _pack_params(batch.shape[1])
    with annotate("huff.encode.device"):
        res = dev.encode_blocks(jnp.asarray(batch), jnp.asarray(n_valid),
                                W, capw)
    return _assemble_batch(batch, n_valid, res)


def _assemble_batch(batch: np.ndarray, n_valid: np.ndarray,
                    res) -> list[bytes]:
    """Transfer + assemble one device batch's results into wire bytes."""
    W, _capw = _pack_params(batch.shape[1])
    payload, total_bits, left, right, root, overflow = res
    total_bits_h = np.asarray(total_bits)
    overflow_h = np.asarray(overflow)
    # Transfer only a bucketed prefix of the padded payload buffer: rows are
    # ragged and the device->host link is the bottleneck (the worst-case
    # buffer is 4N bytes/row but typical payloads are ~0.6N).
    with annotate("huff.encode.d2h"):
        maxb = _bucket(max(1, (int(total_bits_h.max()) + 7) // 8), 1024)
        payload_h = np.asarray(payload[:, : min(maxb, 4 * W)])
        left_h = np.asarray(left)
        right_h = np.asarray(right)
        root_h = np.asarray(root)

    trees = lens_t = None
    if native.available():
        trees, lens_t = native.serialize_trees(left_h, right_h, root_h)

    if trees is not None and not overflow_h.any():
        # Whole-batch native assembly (reference emit order,
        # src/encoder.c:325-351): one pass instead of a per-block Python
        # loop — n_valid == 0 rows are padding and skipped natively.
        with annotate("huff.encode.assemble"):
            plens = (total_bits_h.astype(np.int64) + 7) // 8
            return [native.assemble_blocks(
                n_valid.astype(np.uint64), trees, lens_t, payload_h, plens)]

    out = []
    with annotate("huff.encode.assemble"):
        for b in range(len(batch)):
            nv = int(n_valid[b])
            if nv == 0:
                continue  # padding block
            if overflow_h[b]:
                out.append(hostref.encode_block(batch[b, :nv]))
                continue
            if trees is not None:
                tree = trees[b, : lens_t[b]]
            else:
                tree = serialize_tree(
                    ArrayTree(left_h[b], right_h[b], int(root_h[b]))
                )
            nbytes = (int(total_bits_h[b]) + 7) // 8
            out.append(pack_block(nv, tree, payload_h[b, :nbytes].tobytes()))
    return out


def encode(
    data: bytes | np.ndarray,
    blocksize: int = DEFAULT_BLOCK_SIZE,
    batch_blocks: int = DEFAULT_BATCH_BLOCKS,
    config=None,
) -> bytes:
    """Encode ``data`` into the libhuffman block format on the device.

    ``blocksize == 0`` treats the whole input as one block
    (src/encoder.c:163-165); the ragged tail becomes its own smaller block.
    Passing an :class:`~libhuffman_tpu.config.EncodeConfig` overrides the
    positional knobs (config.length caps the input; config.mesh routes the
    batches through the sharded path).
    """
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    if config is not None:
        blocksize = config.blocksize
        batch_blocks = config.batch_blocks
        if config.length:
            buf = buf[: config.length]
        if config.mesh is not None:
            from .parallel.shard import encode_stream_sharded

            return encode_stream_sharded(buf, blocksize, config.mesh)
    n = len(buf)
    if n == 0:
        return b""
    if blocksize <= 0:
        blocksize = n
    if blocksize > (1 << 21):
        # Oversized single blocks (blocksize=0 on a large input, or an
        # explicit multi-MB blocksize): the Pallas path keeps a whole
        # block's canvases in VMEM, and codes can exceed the 32-bit device
        # fast path beyond ~2 MB anyway (ops/device.MAX_CODE_BITS) — take
        # the host-exact encoder, block by block.
        out = []
        for off in range(0, n, blocksize):
            out.append(hostref.encode_block(buf[off : off + blocksize]))
        return b"".join(out)
    nblocks = -(-n // blocksize)

    import jax.numpy as jnp

    def make_batch(start_blk: int):
        nb = min(batch_blocks, nblocks - start_blk)
        B = _bucket_blocks(nb)
        batch = np.zeros((B, blocksize), dtype=np.uint8)
        n_valid = np.zeros(B, dtype=np.int32)
        for i in range(nb):
            off = (start_blk + i) * blocksize
            seg = buf[off : off + blocksize]
            batch[i, : len(seg)] = seg
            n_valid[i] = len(seg)
        return batch, n_valid

    starts = list(range(0, nblocks, batch_blocks))
    chunks: list[bytes] = []
    # Up to FUSE_BATCHES sub-batches per dispatch (one flat ~23.5 ms RTT
    # each; tuple length is part of the jit key, so group sizes stay few).
    for g in range(0, len(starts), FUSE_BATCHES):
        host_batches = [make_batch(s) for s in starts[g : g + FUSE_BATCHES]]
        if len(host_batches) == 1:
            chunks.extend(_encode_batch(*host_batches[0]))
            continue
        W, capw = _pack_params(blocksize)
        # Same-shape sub-batches fuse; a ragged tail batch (different B
        # bucket) dispatches separately rather than forcing a new key.
        shapes = {b.shape for b, _ in host_batches}
        fused = [bn for bn in host_batches if bn[0].shape == max(shapes)]
        rest = [bn for bn in host_batches if bn[0].shape != max(shapes)]
        with annotate("huff.encode.device"):
            results = dev.encode_blocks_many(
                tuple((jnp.asarray(b), jnp.asarray(nv)) for b, nv in fused),
                W, capw)
        for (b, nv), res in zip(fused, results):
            chunks.extend(_assemble_batch(b, nv, res))
        for b, nv in rest:
            chunks.extend(_encode_batch(b, nv))
    return b"".join(chunks)
