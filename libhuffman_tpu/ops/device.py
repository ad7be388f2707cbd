"""Batched TPU encode kernels (JAX/XLA).

Everything here operates on a *batch* of independent fixed-size blocks — the
format's parallelism axis (SURVEY.md §2.5).  The reference's three sequential
hot loops (src/encoder.c: histogram per byte, two-minimum scan per merge
round, bit emission per bit) become:

  * ``histogram``      — nibble one-hot MXU matmul (32 VPU ops/byte + a
                         16x16 contraction instead of a 256-wide compare or a
                         serializing scatter-add),
  * ``build_trees``    — fixed-trip (256-round) masked two-argmin over the
                         512-slot rate vectors, batched over blocks; replicates
                         the reference's exact tie-breaking (src/tree.c:318-414,
                         ties to the larger index via ``<=`` comparisons),
  * ``extract_codes``  — 32-step parent-pointer walk producing MSB-first
                         codeword values (fast path: code length <= 32 bits,
                         which covers every physically possible block up to
                         ~2 MB; deeper blocks are flagged for host fallback),
  * ``pack_tree.pack_words`` — gather-free bit packer: a balanced merge tree
                         of barrel shifts concatenates the per-symbol
                         codewords (see ops/pack_tree.py; replaces the
                         sequential 1-byte bit accumulator, src/bufio.c:16-32).
                         The symbol->code lookup itself is a one-hot MXU
                         contraction (ops/mxu_gather.py).

All shapes are static; ragged blocks are padded and masked via ``n_valid``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format import ASCII_COUNT, HISTOGRAM_LEN
from . import mxu_gather, pack_tree

MAX_CODE_BITS = 32  # device fast-path limit; see module docstring
# Plain int, not jnp.int32: a module-level device scalar would initialize
# the XLA backend at import time, breaking jax.distributed.initialize for
# multihost workers (it must run before any backend touch).
_BIG = 1 << 30


# --------------------------------------------------------------------------
# Histogram
# --------------------------------------------------------------------------

def histogram(blocks: jax.Array, n_valid: jax.Array, chunk: int = 8192) -> jax.Array:
    """Byte-frequency histograms, (B, N) u8 -> (B, 512) i32.

    Equivalent of src/histogram.c:74-100 with iota=1, length=512 — slots
    256..511 are zero scratch for the tree builder's internal-node rates.

    Uses the nibble decomposition count[s] = sum_j [hi_j == s>>4][lo_j == s&15]
    so the per-symbol count is a (16, N) x (N, 16) contraction on the MXU with
    exact f32 accumulation (counts < 2^24), instead of a 256-wide VPU compare
    or a serializing scatter-add.
    """
    B, N = blocks.shape
    hi = (blocks >> 4).astype(jnp.int32)
    lo = (blocks & 15).astype(jnp.int32)
    # One-hots are built (B, 16, chunk) — nibble axis in the middle — so the
    # minor (lane) axis is the long chunk axis.  The previous (B, chunk, 16)
    # form put 16 on lanes, which XLA pads to the 128-lane tile: an 8x
    # memory bloat that made the histogram HBM-bound (measured 22.6 ms for
    # a 16.8 MB batch; see PERF.md §4).
    nib = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)

    if N % chunk:
        chunk = N  # small inputs: single chunk
    n_chunks = N // chunk

    def step(acc, xs):
        hi_c, lo_c = xs  # (B, chunk) each
        oh_hi = (hi_c[:, None, :] == nib).astype(jnp.bfloat16)
        oh_lo = (lo_c[:, None, :] == nib).astype(jnp.bfloat16)
        # (B, 16, 16) <- contract over the chunk axis, batched over B.
        cnt = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return acc + cnt, None

    xs = (
        hi.reshape(B, n_chunks, chunk).swapaxes(0, 1),
        lo.reshape(B, n_chunks, chunk).swapaxes(0, 1),
    )
    acc0 = jnp.zeros((B, 16, 16), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, xs)
    counts = acc.reshape(B, 256).astype(jnp.int32)
    # Padding positions are zero bytes; counting them unmasked and
    # subtracting the pad count from slot 0 is cheaper than a per-byte
    # validity multiply inside the contraction.
    pad = (N - n_valid).astype(jnp.int32)
    counts = counts.at[:, 0].add(-pad)
    return jnp.concatenate(
        [counts, jnp.zeros((B, HISTOGRAM_LEN - ASCII_COUNT), jnp.int32)], axis=1
    )


def _hist_kernel_body(R: int, K: int, GB: int):
    import jax.experimental.pallas as pl

    def kernel(bytes_ref, out_ref):
        for g in range(GB):
            _hist_one(bytes_ref, out_ref, g, R, K)

    return kernel


def _hist_one(bytes_ref, out_ref, g, R, K):
    if True:
        # 8 input segments share one (128, K) x (K, 128) contraction —
        # block-diagonal one-hots keep the MXU's M/N dimensions full (a
        # (16, N) x (N, 16) dot streamed K at ~1 column/cycle: measured
        # ~70 us per 64 KiB block).  Segment counts land in the 8 diagonal
        # (16, 16) blocks and sum after the loop.
        import jax.experimental.pallas as pl

        qiota = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        seg16 = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0) * 16
        acc = jnp.zeros((128, 128), jnp.float32)
        for r in range(R):
            seg = bytes_ref[g, pl.ds(r * 8, 8), :].astype(jnp.int32)
            hi = ((seg >> 4).reshape(8, 1, K) + seg16)
            lo = ((seg & 15).reshape(8, 1, K) + seg16)
            hiR = jnp.broadcast_to(hi, (8, 16, K)).reshape(128, K)
            loR = jnp.broadcast_to(lo, (8, 16, K)).reshape(128, K)
            A = (hiR == qiota).astype(jnp.bfloat16)
            Bm = (loR == qiota).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                A, Bm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out = jnp.zeros((16, 16), jnp.float32)
        for s in range(8):
            out = out + acc[16 * s:16 * s + 16, 16 * s:16 * s + 16]
        out_ref[g] = out


def histogram_pallas(blocks: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Histogram via an in-VMEM nibble contraction, one block per grid step.

    The XLA nibble matmul keeps (B, 16, chunk) bf16 one-hots in HBM and its
    16x16 matmuls starve the MXU (measured 22.9 ms / 16.8 MB, PERF.md §4);
    here the one-hots are VMEM-transient and the contraction streams the
    whole block as the K dimension.  Requires N % 4096 == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = blocks.shape
    # R outer steps of 8 segments each; K lanes per segment row.  Several
    # blocks share one grid step: per-step overhead measured ~80 us on
    # this platform, dwarfing the ~10 us of per-block compute.
    R = max(1, N // 8 // 2048)
    K = N // (8 * R)
    GB = 1  # measured: grouping blocks per grid step did not help
    cnt = pl.pallas_call(
        _hist_kernel_body(R, K, GB),
        grid=(B // GB,),
        in_specs=[
            pl.BlockSpec((GB, 8 * R, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, 16, 16), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16, 16), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(blocks.reshape(B, 8 * R, K))
    counts = cnt.reshape(B, 256).astype(jnp.int32)
    pad = (N - n_valid).astype(jnp.int32)
    counts = counts.at[:, 0].add(-pad)
    return jnp.concatenate(
        [counts, jnp.zeros((B, HISTOGRAM_LEN - ASCII_COUNT), jnp.int32)],
        axis=1)


# --------------------------------------------------------------------------
# Tree construction
# --------------------------------------------------------------------------

def build_trees(freqs: jax.Array):
    """Batched reference-exact tree build, (B, 512) i32 -> array trees.

    256 fixed merge rounds (enough for 255 binary merges + the unary root
    wrap).  Per round the two smallest non-zero rates are found with ties
    broken toward the larger slot index — the batched equivalent of the
    reference's running two-minimum scan (src/tree.c:329-352, `<=`
    comparisons make the last minimum win).  The sole survivor is wrapped in
    a parent with only a left child (tree.c:410-413): the unary-root
    invariant that gives every codeword its leading 0 bit.

    Returns (left, right, parent, pbit, root): (B,512) i32 x4 and (B,) i32
    (root == -1 for all-zero histograms, i.e. padding blocks).  ``pbit`` is
    each node's branch bit within its parent (0 = left child, 1 = right),
    recorded during the merge so codeword extraction needs no second lookup.
    """
    B = freqs.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, HISTOGRAM_LEN), 1)

    def round_fn(i, st):
        rates, left, right, parent, pbit, root, done = st
        node = ASCII_COUNT + i
        active = rates > 0
        cnt = jnp.sum(active, axis=1)
        r1 = jnp.min(jnp.where(active, rates, _BIG), axis=1)
        i1 = jnp.max(jnp.where(active & (rates == r1[:, None]), iota, -1), axis=1)
        oh1 = iota == i1[:, None]
        act2 = active & ~oh1
        r2 = jnp.min(jnp.where(act2, rates, _BIG), axis=1)
        i2 = jnp.max(jnp.where(act2 & (rates == r2[:, None]), iota, -1), axis=1)
        oh2 = iota == i2[:, None]

        merge = ~done & (cnt >= 2)
        wrap = ~done & (cnt == 1)
        upd = merge | wrap

        rates = jnp.where(upd[:, None] & oh1, 0, rates)
        rates = jnp.where(merge[:, None] & oh2, 0, rates)
        new_rate = jnp.where(merge, r1 + r2, r1)
        col = jnp.where(upd, new_rate, rates[:, node])
        rates = jax.lax.dynamic_update_index_in_dim(rates, col, node, axis=1)

        lcol = jnp.where(upd, i1, left[:, node])
        left = jax.lax.dynamic_update_index_in_dim(left, lcol, node, axis=1)
        rcol = jnp.where(merge, i2, right[:, node])
        right = jax.lax.dynamic_update_index_in_dim(right, rcol, node, axis=1)
        parent = jnp.where(upd[:, None] & oh1, node, parent)
        parent = jnp.where(merge[:, None] & oh2, node, parent)
        pbit = jnp.where(merge[:, None] & oh2, 1, pbit)  # oh1 stays 0
        root = jnp.where(wrap, node, root)
        done = done | wrap | (cnt == 0)
        return rates, left, right, parent, pbit, root, done

    neg = jnp.full((B, HISTOGRAM_LEN), -1, jnp.int32)
    st = (
        freqs.astype(jnp.int32),
        neg, neg,
        jnp.full((B, HISTOGRAM_LEN), -1, jnp.int32),
        jnp.zeros((B, HISTOGRAM_LEN), jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), bool),
    )
    _, left, right, parent, pbit, root, _ = jax.lax.fori_loop(
        0, ASCII_COUNT, round_fn, st
    )
    return left, right, parent, pbit, root


# --------------------------------------------------------------------------
# Codeword extraction
# --------------------------------------------------------------------------

def extract_codes(parent: jax.Array, pbit: jax.Array):
    """Per-symbol codewords from parent pointers + recorded branch bits.

    (B,512) trees -> codes (B,256) u32, lens (B,256) i32, overflow (B,) bool.

    Walks each leaf toward the root for MAX_CODE_BITS steps; setting the
    t-th collected bit at position t leaves the root-most bit highest, so
    ``codes`` holds the MSB-first codeword value directly (matches the
    reference's reversed string walk, src/tree.c:12-47 + encoder.c:106-108).
    Each step is a single one-hot MXU lookup of a packed (parent+1, branch
    bit) word — per-lane ``take_along_axis`` gathers lower to a ~0.1 G/s
    scalar loop on TPU (measured, bench/probe_primitives.py), which made the
    original gather walk ~60 ms/batch; the unrolled one-hot walk is ~2 ms.
    ``overflow`` flags blocks whose walk did not reach the root — those are
    re-encoded on the host fallback path (requires a multi-MB adversarial
    block; never hit on real data).
    """
    B = parent.shape[0]
    sym = jax.lax.broadcasted_iota(jnp.int32, (B, ASCII_COUNT), 1)
    # pp[n] = (parent[n] + 1) | pbit[n] << 10; parent -1 (root / absent) -> 0.
    pp = ((parent + 1).astype(jnp.uint32) | (pbit.astype(jnp.uint32) << 10))

    node = sym
    code = jnp.zeros((B, ASCII_COUNT), jnp.uint32)
    ln = jnp.zeros((B, ASCII_COUNT), jnp.int32)
    for _ in range(MAX_CODE_BITS):
        e = mxu_gather.gather_u32(pp, node, n_bytes=2)
        p1 = (e & 0x3FF).astype(jnp.int32)
        has = p1 > 0
        bit = (e >> 10) & 1
        code = jnp.where(has, code | (bit << ln.astype(jnp.uint32)), code)
        ln = ln + has.astype(jnp.int32)
        node = jnp.where(has, p1 - 1, node)
    final = mxu_gather.gather_u32(pp, node, n_bytes=2)
    overflow = jnp.any((final & 0x3FF) > 0, axis=1)
    return code, ln, overflow


# --------------------------------------------------------------------------
# Bit packing
# --------------------------------------------------------------------------

def symbol_layout(blocks: jax.Array, codes: jax.Array, lens: jax.Array,
                  n_valid: jax.Array):
    """Per-position codeword and code length for a block batch.

    The symbol->code lookup rides the MXU as a one-hot contraction
    (ops/mxu_gather) instead of a per-lane gather: a single fused lookup of
    the four code bytes plus the length byte per input position.
    """
    B, N = blocks.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    sym = blocks.astype(jnp.int32)
    pieces = jnp.concatenate(
        [mxu_gather.split_bytes(codes, 4),
         lens.astype(jnp.uint8)[:, :, None]], axis=2
    )  # (B, 256, 5)
    g = mxu_gather.gather_bytes(pieces, sym).astype(jnp.uint32)  # (B, N, 5)
    C = g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16) | (g[..., 3] << 24)
    L = jnp.where(pos < n_valid[:, None], g[..., 4].astype(jnp.int32), 0)
    return C, L


def _layout_kernel_body(RN: int):
    import jax.experimental.pallas as pl

    # 32 rows per step: the 8-row version ran ~8k fori iterations per
    # 128-block batch and was iteration-overhead-bound (round 5).
    TR = 32 if RN % 32 == 0 else 8

    def kernel(blocks_ref, codes_ref, lens_ref, nv_ref, C_ref, L_ref):
        nv = nv_ref[pl.program_id(0)]
        c_rows = [codes_ref[0, r:r + 1, :] for r in range(2)]
        l_rows = [lens_ref[0, r:r + 1, :] for r in range(2)]

        def tile(t, _):
            b = blocks_ref[0, pl.ds(t * TR, TR), :].astype(jnp.int32)
            lo = b & 127
            hi = b >> 7
            c = jnp.zeros((TR, 128), jnp.uint32)
            ln = jnp.zeros((TR, 128), jnp.int32)
            for r in range(2):
                cr = jnp.take_along_axis(
                    jnp.broadcast_to(c_rows[r], (TR, 128)), lo, axis=1)
                lr = jnp.take_along_axis(
                    jnp.broadcast_to(l_rows[r], (TR, 128)), lo, axis=1)
                c = jnp.where(hi == r, cr, c)
                ln = jnp.where(hi == r, lr, ln)
            row = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 0) + t * TR
            lane = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)
            pos = row * 128 + lane
            ln = jnp.where(pos < nv, ln, 0)
            C_ref[0, pl.ds(t * TR, TR), :] = c
            L_ref[0, pl.ds(t * TR, TR), :] = ln
            return 0

        jax.lax.fori_loop(0, RN // TR, tile, 0)

    return kernel


def symbol_layout_pallas(blocks: jax.Array, codes: jax.Array,
                         lens: jax.Array, n_valid: jax.Array):
    """Per-position (codeword, length) via hardware lane permutes.

    The one-hot-MXU lookup (symbol_layout) materializes a (B, N, T1*K) f32
    partial per masked reduction — ~320 bytes of HBM traffic per input byte
    (measured 34.7 ms for a 16.8 MB batch, PERF.md §4).  Here the 256-entry
    tables sit in VMEM as two 128-lane rows and each byte costs four
    permutes + selects.  Requires N % 1024 == 0 (whole (8, 128) tiles).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = blocks.shape
    RN = N // 128
    kernel = _layout_kernel_body(RN)
    C, L = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, RN, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid, whole (B,)
        ],
        out_specs=[
            pl.BlockSpec((1, RN, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RN, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, RN, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, RN, 128), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(blocks.reshape(B, RN, 128), codes.reshape(B, 2, 128),
      lens.astype(jnp.int32).reshape(B, 2, 128),
      n_valid.astype(jnp.int32))
    return C.reshape(B, N), L.reshape(B, N)


def words_to_bytes(words: jax.Array) -> jax.Array:
    """(B, W) big-endian u32 -> (B, 4W) u8 payload bytes."""
    B, W = words.shape
    b = jnp.stack(
        [(words >> 24), (words >> 16), (words >> 8), words], axis=-1
    ).astype(jnp.uint8)
    return b.reshape(B, 4 * W)


# --------------------------------------------------------------------------
# Jitted pipeline
# --------------------------------------------------------------------------
#
# The whole encode runs as ONE jitted program.  A split pipeline (histogram/
# tree/codes first, host-sized word buffer, pack second) was measured 16000x
# slower on TPU purely from the stage boundary: arrays produced by one
# executable and consumed by another picked up pathological device layouts
# (1.6 s vs 0.1 ms for identical shapes with fresh inputs).  Fusing also
# saves a dispatch (the axon tunnel costs ~28 ms per call).  The word buffer
# uses the exact worst case W = N (codes are <= 32 bits = 32N bits = N
# words), so no pre-sizing pass is needed.

@functools.partial(jax.jit, static_argnums=(2, 3))
def encode_blocks(blocks: jax.Array, n_valid: jax.Array, W: int,
                  capw: int = 64):
    """Full batched encode: (B, N) u8 + valid lengths -> per-block payload
    bytes, bit totals, array trees, and per-block fallback flags.

    ``capw`` clamps the packer's inter-chunk string capacity (words per 64
    input bytes); blocks that exceed it are flagged in ``overflow`` and the
    driver re-encodes them with capw=64 (the true worst case).

    optimization_barrier between phases keeps XLA from rematerializing a
    producer (e.g. the histogram) inside a consumer loop's body.
    """
    N = blocks.shape[1]
    if N % 4096 == 0:
        freqs = histogram_pallas(blocks, n_valid)
    else:
        freqs = histogram(blocks, n_valid)
    freqs = jax.lax.optimization_barrier(freqs)
    left, right, parent, pbit, root = jax.lax.optimization_barrier(
        build_trees(freqs)
    )
    codes, lens, overflow = jax.lax.optimization_barrier(
        extract_codes(parent, pbit)
    )
    total_bits = jnp.sum(freqs[:, :ASCII_COUNT] * lens, axis=1)
    if N % 1024 == 0:
        C, L = symbol_layout_pallas(blocks, codes, lens, n_valid)
        C, L = jax.lax.optimization_barrier((C, L))
    else:
        C, L = jax.lax.optimization_barrier(
            symbol_layout(blocks, codes, lens, n_valid)
        )
    if N % 1024 == 0 and W % 128 == 0 and N & (N - 1) == 0:
        # VMEM merge-tree kernel with capw-clamped intermediate capacity
        # (concat_kernel.concat_words_ovf): ~2.7x less canvas traffic than
        # the exact-capacity tree for typical code lengths; clamped-out
        # blocks are flagged and re-encoded exactly on the host.  The
        # merge tree needs a pow2 string count (non-pow2 multiples of
        # 1024, e.g. blocksize 3072, take the chunked XLA packer).
        from . import concat_kernel

        ln = L.astype(jnp.uint32)
        level0 = jnp.where(ln > 0, C << ((jnp.uint32(32) - ln) & 31),
                           jnp.uint32(0))
        words, clamp_ovf = concat_kernel.concat_words_ovf(level0, L, W, capw)
        pack_ovf = clamp_ovf | (total_bits > 32 * W)
    else:
        words, pack_ovf = pack_tree.pack_words_chunked(C, L, W, capw)
    return (words_to_bytes(words), total_bits, left, right, root,
            overflow | pack_ovf)


@functools.partial(jax.jit, static_argnums=(1, 2))
def encode_blocks_many(batches, W: int, capw: int = 64):
    """Several block batches in ONE dispatch.

    Dispatch latency is a flat ~23.5 ms that does not pipeline
    (bench/probe_r4_dispatch.py), and XLA schedules a 256-block batch ~35%
    faster per byte than one 1536-block mega-batch (measured round 4) —
    so the driver encodes a stream as a tuple of 256-block sub-batches
    fused into a single program.  XLA frees each sub-batch's
    intermediates before the next runs.
    """
    return tuple(encode_blocks(b, nv, W, capw) for (b, nv) in batches)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def encode_blocks_prefix_rep(blocks: jax.Array, n_valid: jax.Array, W: int,
                             capw: int, upto: int, R: int):
    """``encode_blocks_prefix`` replicated R times (distinct salts, no CSE)
    inside one dispatch.  Differencing two R values cancels both the flat
    dispatch RTT and the max(RTT, device) hiding of sub-RTT stages — the
    only honest absolute timing for stages cheaper than ~23 ms on this
    platform (PERF.md §1)."""
    acc = jnp.uint32(0)
    for i in range(1, R + 1):
        acc = acc + encode_blocks_prefix(
            blocks ^ jnp.uint8(i), n_valid, W, capw, upto).astype(jnp.uint32)
    return acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def encode_blocks_prefix(blocks: jax.Array, n_valid: jax.Array, W: int,
                         capw: int, upto: int):
    """Profiling ablation: the encode pipeline truncated after stage ``upto``
    (1=histogram, 2=+tree, 3=+codes, 4=+layout, 5=+pack), reduced to a tiny
    checksum so stage outputs never leave the device.  Phase cost k =
    t(k) - t(k-1); the BENCH_PHASES=1 bench path drives this."""
    u32 = jnp.uint32
    if blocks.shape[1] % 4096 == 0:
        freqs = histogram_pallas(blocks, n_valid)
    else:
        freqs = histogram(blocks, n_valid)
    if upto == 1:
        return jnp.sum(freqs.astype(u32))
    freqs = jax.lax.optimization_barrier(freqs)
    left, right, parent, pbit, root = jax.lax.optimization_barrier(
        build_trees(freqs)
    )
    if upto == 2:
        return jnp.sum(left.astype(u32)) + jnp.sum(root.astype(u32))
    codes, lens, overflow = jax.lax.optimization_barrier(
        extract_codes(parent, pbit)
    )
    if upto == 3:
        return jnp.sum(codes) + jnp.sum(lens.astype(u32))
    if blocks.shape[1] % 1024 == 0:
        C, L = jax.lax.optimization_barrier(
            symbol_layout_pallas(blocks, codes, lens, n_valid)
        )
    else:
        C, L = jax.lax.optimization_barrier(
            symbol_layout(blocks, codes, lens, n_valid)
        )
    if upto == 4:
        return jnp.sum(C) + jnp.sum(L.astype(u32))
    N5 = blocks.shape[1]
    if N5 % 1024 == 0 and W % 128 == 0 and N5 & (N5 - 1) == 0:
        from . import concat_kernel

        ln = L.astype(jnp.uint32)
        level0 = jnp.where(ln > 0, C << ((jnp.uint32(32) - ln) & 31),
                           jnp.uint32(0))
        words = concat_kernel.concat_words(level0, L, W)
        return jnp.sum(words)
    words, pack_ovf = pack_tree.pack_words_chunked(C, L, W, capw)
    return jnp.sum(words) + jnp.sum(pack_ovf.astype(u32))
