"""Gather-free bit packing: variable-length bitstring concatenation as a
balanced merge tree of barrel shifts.

The packing problem — lay N codewords of 1..32 bits end to end — is a
reduction with the *bitstring concatenation* monoid.  The previous packer
(ops/device.pack_words) let every output word gather its overlapping codes;
on TPU, XLA lowers arbitrary per-lane gathers to ~85 M/s scalar loops
(measured on v5e), which made packing 1000x slower than everything else
combined.  This implementation uses no gathers at all:

  level 0   each symbol is a 1-word string: code left-aligned (MSB-first),
  level k   pairs of 2^k-word strings merge into 2^(k+1)-word strings:
            out = a | (b >> len_a), where ">> len_a" is
              * a word-granular barrel shift (one static pad-and-slide
                select per bit of len_a/32), then
              * one elementwise bit shift by len_a % 32 blended with the
                neighbouring word.

Everything is dense elementwise u32 arithmetic over regular layouts — VPU
speed (7 G elem/s measured), compiler-fusible, and exact for any code
lengths: capacity 2^k words per string is the true worst case (32
bits/symbol), so there is no overflow path at all.

Layout: strings live along the *lane* (minor) axis while they are numerous
— (B, cap, P) — and transpose once to (B, P, cap) when P drops to a lane's
width, keeping the vector units full at every level.

Replaces the sequential 1-byte bit accumulator of the reference
(reference: src/bufio.c:16-32 via src/encoder.c:85-131).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Transpose from (B, cap, P) to (B, P, cap) once P (the minor axis) reaches
# this; 128 = one lane row.
_SWAP_AT = 128


def _word_shift(b: jax.Array, s_words: jax.Array, axis: int) -> jax.Array:
    """Shift string words toward higher indices by a per-string word count
    in [0, cap]; vacated words fill with zero.  Barrel construction: one
    static pad-and-slide select per shift bit."""
    cap = b.shape[axis]
    n_bits = max(1, cap.bit_length())
    for j in range(n_bits):
        step = 1 << j
        bit_on = (s_words >> j) & 1 == 1
        if step >= cap:
            b = jnp.where(bit_on, jnp.zeros_like(b), b)
            continue
        pad = [(0, 0)] * b.ndim
        pad[axis] = (step, 0)
        shifted = jax.lax.slice_in_dim(jnp.pad(b, pad), 0, cap, axis=axis)
        b = jnp.where(bit_on, shifted, b)
    # Shifts past the capacity (possible when a caller clamps capacity
    # between merge levels) push the whole string out of the buffer.
    b = jnp.where(s_words >= cap, jnp.zeros_like(b), b)
    return b


def _bit_shift(b: jax.Array, r: jax.Array, axis: int) -> jax.Array:
    """Shift string bits toward higher offsets by r in [0, 32)."""
    cap = b.shape[axis]
    pad = [(0, 0)] * b.ndim
    pad[axis] = (1, 0)
    prev = jax.lax.slice_in_dim(jnp.pad(b, pad), 0, cap, axis=axis)
    r = r.astype(jnp.uint32)
    return jnp.where(r == 0, b, (b >> r) | (prev << (jnp.uint32(32) - r)))


def _merge(strings, lens, axis: int):
    """One merge level: concatenate string pairs along ``axis`` (the word
    axis); the pair index is the other non-batch axis."""
    pair_axis = 3 - axis  # 1 <-> 2
    a = jax.lax.slice_in_dim(strings, 0, None, 2, axis=pair_axis)
    b = jax.lax.slice_in_dim(strings, 1, None, 2, axis=pair_axis)
    la = lens[:, 0::2]
    lb = lens[:, 1::2]
    shape = [la.shape[0], 1, 1]
    shape[pair_axis] = la.shape[1]
    la_b = la.reshape(shape)
    zeros = jnp.zeros_like(b)
    a = jnp.concatenate([a, zeros], axis=axis)
    b = jnp.concatenate([b, zeros], axis=axis)
    b = _word_shift(b, la_b >> 5, axis)
    b = _bit_shift(b, la_b & 31, axis)
    return a | b, la + lb


def concat_bitstrings(strings: jax.Array, lens: jax.Array,
                      max_cap: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Concatenate P variable-length bitstrings per block.

    strings: (B, cap0, P) u32 — string p of block b is strings[b, :, p],
             MSB-first, bit 0 = MSB of word 0; bits past ``lens`` are zero.
    lens:    (B, P) i32 bit lengths (0 = empty string).  P a power of two.

    ``max_cap`` clamps string capacity (words) between levels: content past
    ``max_cap`` words is dropped.  Sound whenever only the first ``max_cap``
    words of the result are consumed — a string's word k lands at word
    >= k of the result, so truncated words could never reach the kept span.

    Returns (words, total_bits): (B, min(cap0 * P, clamp)) u32 and (B,) i32
    (total_bits counts all input bits, including any truncated by the clamp).
    """
    B, cap, P = strings.shape
    assert P & (P - 1) == 0, P
    axis = 1
    while P > 1:
        if axis == 1 and P <= _SWAP_AT:
            strings = strings.swapaxes(1, 2)  # (B, P, cap)
            axis = 2
        strings, lens = _merge(strings, lens, axis)
        cap *= 2
        P //= 2
        if max_cap is not None and cap > max_cap:
            strings = jax.lax.slice_in_dim(strings, 0, max_cap, axis=axis)
            cap = max_cap
    if axis == 1:
        strings = strings.swapaxes(1, 2)
    return strings.reshape(B, cap), lens[:, 0]


def _soa_merge(ws: tuple, lens: jax.Array):
    """Merge adjacent string pairs in struct-of-arrays form.

    ws: tuple of k (B, P) u32 arrays — word j of string p is ws[j][:, p];
    lens: (B, P) i32 bit lengths.  Returns (tuple of 2k (B, P/2), (B, P/2)).

    The low merge levels (capacity 1-4 words) must avoid the (B, cap, P)
    layout: XLA pads a unit/near-unit ``cap`` dimension to the 8x128 tile,
    which blew a 64 MB temp into 8 GB at bench scale.  Keeping each word
    plane as its own 2-D array sidesteps layout choice entirely.
    """
    k = len(ws)
    a = [w[:, 0::2] for w in ws]
    b = [w[:, 1::2] for w in ws]
    la = lens[:, 0::2]
    lb = lens[:, 1::2]
    s = la >> 5  # word shift in [0, k]
    r = (la & 31).astype(jnp.uint32)
    zero = jnp.zeros_like(b[0])
    bw = []
    for j in range(2 * k):
        acc = zero
        for sv in range(k + 1):
            src = j - sv
            if 0 <= src < k:
                acc = jnp.where(s == sv, b[src], acc)
        bw.append(acc)
    out = []
    prev = zero
    for j in range(2 * k):
        shifted = jnp.where(r == 0, bw[j], (bw[j] >> r) | (prev << (jnp.uint32(32) - r)))
        base = a[j] if j < k else zero
        out.append(base | shifted)
        prev = bw[j]
    return tuple(out), la + lb


def _soa_levels(word0: jax.Array, lens: jax.Array, levels: int):
    """Run ``levels`` struct-of-arrays merges from 1-word strings; returns
    the (B, cap, P) stack ready for the generic tree."""
    ws = (word0,)
    ln = lens
    for _ in range(levels):
        ws, ln = _soa_merge(ws, ln)
    return jnp.stack(ws, axis=1), ln  # (B, 2^levels, P / 2^levels)


def pack_words_chunked(C: jax.Array, L: jax.Array, W: int, capw: int
                       ) -> tuple[jax.Array, jax.Array]:
    """Two-phase packer: 64-symbol chunks concatenate locally, then chunk
    strings (capacity-clamped to ``capw`` words) concatenate globally.

    The naive merge tree carries the 32-bits-per-symbol worst case through
    every level; real chunks hold far fewer bits (~4-6 bits/symbol for text,
    exactly 8 for incompressible data), so clamping the inter-chunk capacity
    to ``capw`` words (bucketed by the driver) cuts the dominant upper-level
    work ~5x.  Chunks whose true bit length exceeds ``capw * 32`` are
    reported via the returned ``overflow`` flag — the driver re-runs those
    batches with the worst-case capacity (capw=64), so clamping never costs
    correctness.

    Returns (words (B, W) u32, overflow (B,) bool).
    """
    B, N = C.shape
    G = 64
    P = 1
    while P < N:
        P *= 2
    if P < 8 * G:  # small blocks: single-phase packer, no overflow possible
        return pack_words(C, L, W), jnp.zeros((B,), bool)
    if P != N:
        C = jnp.pad(C, ((0, 0), (0, P - N)))
        L = jnp.pad(L, ((0, 0), (0, P - N)))
    ln = L.astype(jnp.uint32)
    level0 = jnp.where(
        ln > 0, C << ((jnp.uint32(32) - ln) & 31), jnp.uint32(0)
    )
    strings, lens = _soa_levels(level0, L.astype(jnp.int32), 3)
    cap = 8
    P //= 8
    axis = 1
    overflow = None
    while P > 1:
        if axis == 1 and P <= _SWAP_AT:
            strings = strings.swapaxes(1, 2)
            axis = 2
        strings, lens = _merge(strings, lens, axis)
        cap *= 2
        P //= 2
        if cap == G:
            # Strings now cover G input symbols each: clamp their capacity
            # to the bucketed real maximum (chunk bit lengths are exact
            # here; blocks that exceed the clamp are flagged for redo).
            overflow = jnp.any(lens > capw * 32, axis=1)
            strings = jax.lax.slice_in_dim(strings, 0, capw, axis=axis)
            cap = capw
    if axis == 1:
        strings = strings.swapaxes(1, 2)
    words = strings.reshape(B, cap)
    if overflow is None:
        overflow = jnp.zeros((B,), bool)
    if words.shape[1] < W:
        words = jnp.pad(words, ((0, 0), (0, W - words.shape[1])))
    return words[:, :W], overflow


def pack_words(C: jax.Array, L: jax.Array, W: int) -> jax.Array:
    """Pack per-position codewords into (B, W) big-endian u32 words.

    C: (B, N) u32 MSB-first codeword values; L: (B, N) bit lengths
    (0 = padding position).  Output entries beyond the payload are zero;
    W >= N always suffices (codes are <= 32 bits).
    """
    B, N = C.shape
    P = 1
    while P < N:
        P *= 2
    if P != N:
        C = jnp.pad(C, ((0, 0), (0, P - N)))
        L = jnp.pad(L, ((0, 0), (0, P - N)))
    ln = L.astype(jnp.uint32)
    level0 = jnp.where(ln > 0, C << ((jnp.uint32(32) - ln) & 31), jnp.uint32(0))
    words, _ = concat_bitstrings(level0[:, None, :], L.astype(jnp.int32))
    if words.shape[1] < W:
        words = jnp.pad(words, ((0, 0), (0, W - words.shape[1])))
    return words[:, :W]
