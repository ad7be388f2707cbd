"""Variable-length bitstring concatenation as a single Pallas kernel.

The XLA merge tree (ops/pack_tree.py) is algorithmically right but pays HBM
for every barrel-shift pass: measured 248 ms for the decode emission and
12.7 ms for the encode packer at bench scale (PERF.md §4) — ~10x the
traffic-ideal cost.  This kernel runs the whole tree per block inside VMEM.

Two layout tricks make the tree Mosaic-friendly (no strided slices, no
per-lane gathers):

  * halving pairing + bit reversal — merge levels pair string p with
    p + P/2 instead of 2p / 2p+1.  Pairs then live in contiguous array
    halves (free leading-axis reshapes), at the price of pre-permuting the
    inputs into bit-reversed string order — one XLA transpose of a
    [2]*log2(N) view, done once outside the kernel.
  * plane-major -> string-major switch — while strings outnumber lanes
    (P >= 256) the buffer is plane-major ((cap, GB, P/128, 128):
    word-barrel shifts are leading-axis rolls); at P = 128 the buffer
    transposes once to string-major; the final three levels run on a
    [string, block]-row canvas where every slice is tile-aligned.

Up to GB=16 blocks stack per grid step — the level op count is constant
per step, so stacking divides per-instruction issue overhead (_gb_for).  Buffer
size defaults to the exact N words per level (32-bit codes worst case);
an optional ``capw`` clamp shrinks the intermediate capacities for
typical code lengths, flagging (and host-re-encoding) the rare blocks
whose content exceeds a clamp.

Serves both directions: the encode bit-packer (strings = left-aligned
codewords; replaces the reference's sequential bit accumulator,
src/bufio.c:16-32) and the decode emission (strings = per-8-position
symbol groups from the chain kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def bitrev_permute(x: jax.Array) -> jax.Array:
    """Permute axis 1 (length 2^n) into bit-reversed index order (XLA)."""
    B, N = x.shape
    n = N.bit_length() - 1
    assert 1 << n == N, N
    view = x.reshape((B,) + (2,) * n)
    perm = (0,) + tuple(range(n, 0, -1))
    return view.transpose(perm).reshape(B, N)


def bitrev_t(x: jax.Array) -> jax.Array:
    """(N, B) -> (B, N) with the N axis in bit-reversed order: the
    transpose and the bitrev compose into ONE XLA copy (the decode
    emission feeds the chain kernel's string-major outputs straight into
    the merge tree without an intermediate natural-order plane)."""
    N, B = x.shape
    n = N.bit_length() - 1
    assert 1 << n == N, N
    view = x.reshape((2,) * n + (B,))
    perm = (n,) + tuple(range(n - 1, -1, -1))
    return view.transpose(perm).reshape(B, N)


def _word_barrel(b2, s, axis: int, max_shift: int):
    """Shift words toward higher indices along ``axis`` by per-string word
    counts s in [0, max_shift]; vacated words zero-fill."""
    nbits = max_shift.bit_length()
    for beta in range(nbits):
        k = 1 << beta
        if k > max_shift:
            break
        pad = [(0, 0)] * b2.ndim
        pad[axis] = (k, 0)
        shifted = jax.lax.slice_in_dim(
            jnp.pad(b2, pad), 0, b2.shape[axis], axis=axis)
        bit_on = ((s >> beta) & 1) == 1
        b2 = jnp.where(bit_on, shifted, b2)
    return b2


def _bit_shift(b2, r, axis: int):
    """Shift bits toward higher offsets by r in [0, 32) (MSB-first)."""
    pad = [(0, 0)] * b2.ndim
    pad[axis] = (1, 0)
    prev = jax.lax.slice_in_dim(jnp.pad(b2, pad), 0, b2.shape[axis],
                                axis=axis)
    ru = r.astype(jnp.uint32)
    # (prev << 1) << (31 - r) instead of prev << (32 - r): r == 0 would
    # shift by 32 (undefined).
    return (b2 >> ru) | ((prev << 1) << (jnp.uint32(31) - ru))


def _cap_limit(P: int, N: int, capw: int | None, eguard: int = 64) -> int:
    """Clamped per-string word capacity at the level with P strings.

    ``capw`` = words per 64 base strings (the encode packer's proven
    heuristic: text codes average ~4.5 bits, incompressible exactly 8, so
    24 words/64 symbols covers mean code length <= 12 bits).  Content past
    the clamp is dropped and the block flagged (overflow output) — the
    driver re-encodes flagged blocks exactly on the host.

    Levels aggregating fewer than ``eguard`` base strings stay exact:
    variance dominates small sums (four 9-bit codes would overflow a
    mean-based clamp).  Sub-``eguard`` levels down to 16 strings clamp to
    the mean-based cap plus a half-capacity variance floor — the exact
    early levels are ~2.7x the clamped canvas per level, so tightening
    them is where the remaining packer traffic lives (probed round 5)."""
    full = N // P
    if capw is None or full < eguard:
        return full
    if full < 64:
        return min(full, max(full // 2, (capw * full) // 64 + 1))
    return min(full, max(1, (capw * full) // 64))


GB = 16  # blocks per grid step: level op count is constant per step, so
# stacking blocks divides instruction-issue overhead (measured round 4:
# ~60% of the single-block kernel's cycles were per-op overhead at these
# small shapes).  The round-5 sweep at the encode packer's shape (N=64Ki,
# capw=24) measured 8 -> 16 another 1.6x (0.88 vs 1.39 ms/128 blocks) and
# 32 a regression (1.88 ms — VMEM canvas pressure); small batches drop to
# 8 so grid-step padding stays under ~33% (see _gb_for).


def _gb_for(B: int) -> int:
    """Grid stacking for a B-block call: 16 when the batch amortizes it,
    8 below 12 blocks (padding to 16 would waste >= 2x on tiny decode
    plans; 8 keeps every canvas slice tile-aligned either way)."""
    return GB if B >= 12 else 8


def _concat_kernel_body(N: int, OUTW: int, capw: int | None = None,
                        lens_packed: bool = False, lscale: int = 8,
                        eguard: int = 64, gb: int = GB):
    def kernel(w_ref, l_ref, out_ref, ovf_ref):
        # Plane-major with a block axis: x (cap, gb, P/128, 128).
        x = w_ref[:].reshape(1, gb, N // 128, 128)
        if lens_packed:
            # Byte j of cell c = symbol count (<= 4) of string c + j*N/4;
            # the stride-N/4 packing makes the unpack a plain byte
            # extract + row concat (no shuffle), and the HBM input is 4x
            # smaller than i32 bit lengths.
            lp = l_ref[:]                            # (gb, N/512, 128) u32
            lens = jnp.concatenate(
                [((lp >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
                  ).astype(jnp.int32) for j in range(4)],
                axis=1) * lscale                     # (gb, N/128, 128) bits
            # Dead strings (live-masked counts) may carry garbage content
            # (the decode chain's zero-padding groups): zero them here so
            # the caller needs no full-plane XLA mask pass.
            x = jnp.where((lens > 0)[None], x, jnp.uint32(0))
        else:
            lens = l_ref[:]                          # (gb, N/128, 128)
        P, cap = N, 1
        ov = jnp.zeros((gb, 1, 128), jnp.int32)

        # Plane-major levels: strings split across row halves.
        while P >= 256:
            cap2 = _cap_limit(P // 2, N, capw, eguard)
            xv = x.reshape(cap, gb, 2, P // 256, 128)
            a = xv[:, :, 0]
            b = xv[:, :, 1]                          # (cap, gb, P/256, 128)
            lv = lens.reshape(gb, 2, P // 256, 128)
            la = lv[:, 0]
            lb = lv[:, 1]                            # (gb, P/256, 128)
            if cap2 > cap:
                z = jnp.zeros((cap2 - cap,) + b.shape[1:], jnp.uint32)
                b2 = jnp.concatenate([b, z], axis=0)
                a2 = jnp.concatenate([a, z], axis=0)
            else:
                # First clamped level can SHRINK capacity (e.g. 32 -> 24
                # at the 64-string cut): dropped words are overflow, which
                # the lens check below flags.
                b2 = b[:cap2]
                a2 = a[:cap2]
            b2 = _word_barrel(b2, la >> 5, 0, min(cap, cap2))
            b2 = _bit_shift(b2, la & 31, 0)
            x = a2 | b2
            lens = la + lb
            if cap2 < N // (P // 2):
                # Clamped level: content past 32*cap2 bits is gone; flag.
                m = (lens > 32 * cap2).astype(jnp.int32)
                ov = jnp.maximum(ov, jnp.max(m, axis=1, keepdims=True))
            P //= 2
            cap = cap2

        # P == 128: switch to string-major, strings on the middle axis.
        x = jnp.transpose(x.reshape(cap, gb, 128), (1, 2, 0))  # (gb,128,cap)
        lens = jnp.transpose(lens, (0, 2, 1))                  # (gb,128,1)

        # Halving levels while the middle-axis slice offsets stay
        # sublane-tile aligned (P//2 a multiple of 8).
        while P >= 16:
            cap2 = _cap_limit(P // 2, N, capw, eguard)
            a = x[:, : P // 2]
            b = x[:, P // 2 : P]
            la = lens[:, : P // 2]
            lb = lens[:, P // 2 : P]
            if cap2 > cap:
                z = jnp.zeros((gb, P // 2, cap2 - cap), jnp.uint32)
                b2 = jnp.concatenate([b, z], axis=2)
                a2 = jnp.concatenate([a, z], axis=2)
            else:
                b2 = b[:, :, :cap2]
                a2 = a[:, :, :cap2]
            b2 = _word_barrel(b2, la >> 5, 2, min(cap, cap2))
            b2 = _bit_shift(b2, la & 31, 2)
            x = a2 | b2
            lens = la + lb
            if cap2 < N // (P // 2):
                m = (lens > 32 * cap2).astype(jnp.int32)
                ov = jnp.maximum(ov, jnp.max(m, axis=1, keepdims=True))
            P //= 2
            cap = cap2

        # Last three levels (8 strings x gb blocks) on a fixed-width
        # canvas, rows ordered [string, block]: every pair slice is a
        # contiguous gb-row (= 8-row, tile-aligned) band, so all levels
        # stay row-parallel with per-block vector shifts — no broadcast
        # tricks, no per-pair scalar extraction.
        FIN = min(N, max(OUTW, cap))
        if FIN > cap:
            x = jnp.concatenate(
                [x, jnp.zeros((gb, 8, FIN - cap), jnp.uint32)], axis=2)
        else:
            x = x[:, :, :FIN]
        x = jnp.transpose(x, (1, 0, 2)).reshape(8 * gb, FIN)
        lens2 = jnp.transpose(lens, (1, 0, 2)).reshape(8 * gb, 1)
        lvals = [lens2[k * gb : (k + 1) * gb] for k in range(8)]
        while P >= 2:
            parts = []
            lnew = []
            for k in range(P // 2):
                a = x[k * gb : (k + 1) * gb]
                b = x[(k + P // 2) * gb : (k + P // 2 + 1) * gb]
                la = lvals[k]                        # (gb, 1)
                sw = la >> 5
                b2 = _word_barrel(b, sw, 1, FIN)
                # Content shifted past the output budget truncates (sound:
                # content only moves toward higher words); without this
                # guard the barrel would WRAP shifts >= 2^nbits.
                b2 = jnp.where(sw >= FIN, jnp.zeros_like(b2), b2)
                b2 = _bit_shift(b2, la & 31, 1)
                parts.append(a | b2)
                lnew.append(la + lvals[k + P // 2])
            x = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            lvals = lnew
            P //= 2

        if OUTW > FIN:
            # OUTW can exceed the N-word content bound (e.g. a speculative
            # decode plan whose payload cap is far below its n_sym budget):
            # the concatenation can never fill the budget; zero-pad.
            xout = jnp.concatenate(
                [x[:gb, :FIN],
                 jnp.zeros((gb, OUTW - FIN), jnp.uint32)], axis=1)
        else:
            xout = x[:gb, :OUTW]
        out_ref[:] = xout.reshape(gb, OUTW // 128, 128)
        ovf_ref[:] = jnp.broadcast_to(ov, (gb, 8, 128))

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def concat_words_ovf(level0: jax.Array, lens: jax.Array, OUTW: int,
                     capw: int | None = None, eguard: int = 64):
    """Concatenate N variable-length bitstrings per block.

    level0: (B, N) u32 — string p left-aligned (MSB-first), bits past its
            length zero; lens: (B, N) i32 bit lengths (0 = empty), each
            <= 32.  N a power of two >= 256; OUTW a multiple of 128.
    Returns ((B, OUTW) u32 big-endian words of the concatenation, (B,)
    bool overflow flags).

    ``capw`` clamps intermediate per-string capacity to capw words per 64
    base strings: the merge-tree canvas shrinks ~2.7x for typical code
    lengths (it was the encode packer's dominant cost), and a block whose
    content exceeds a clamp is flagged — the driver re-encodes flagged
    blocks exactly on the host (same contract as pack_words_chunked).
    ``eguard`` lowers the exact-level guard (see ``_cap_limit``): levels
    aggregating [eguard, 64) base strings clamp to the mean-based cap with
    a half-capacity variance floor instead of staying exact.
    """
    B, N = level0.shape
    assert N >= 256 and N & (N - 1) == 0, N
    assert OUTW % 128 == 0, OUTW
    gb = _gb_for(B)
    Bp = -(-B // gb) * gb  # pad to a whole grid step (zero strings)
    if Bp != B:
        level0 = jnp.pad(level0, ((0, Bp - B), (0, 0)))
        lens = jnp.pad(lens, ((0, Bp - B), (0, 0)))
    w = bitrev_permute(level0)
    l = bitrev_permute(lens.astype(jnp.int32))
    words, ovf = pl.pallas_call(
        _concat_kernel_body(N, OUTW, capw, eguard=eguard, gb=gb),
        grid=(Bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, OUTW // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, OUTW // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, 8, 128), jnp.int32),
        ],
        # 8 stacked 64Ki-string canvases + live level temporaries exceed
        # the default 16 MB scoped-vmem budget; the chip has more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w.reshape(Bp, N // 128, 128), l.reshape(Bp, N // 128, 128))
    return (words.reshape(Bp, OUTW)[:B],
            jnp.max(ovf, axis=(1, 2))[:B] > 0)


@functools.partial(jax.jit, static_argnums=(2,))
def concat_words(level0: jax.Array, lens: jax.Array, OUTW: int) -> jax.Array:
    """Unclamped concatenation: exact at any code length, never overflows."""
    words, _ = concat_words_ovf(level0, lens, OUTW, None)
    return words


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def concat_groups_ovf(level0: jax.Array, gcpacked: jax.Array, OUTW: int,
                      capw: int | None = None, lscale: int = 8):
    """Packed-lens specialization of :func:`concat_words_ovf`.

    level0:   (B, N) u32, ALREADY in bit-reversed string order and already
              left-aligned; bits past each string's length zero.
    gcpacked: (B, N // 4) u32 — per-string u8 length units, byte j of
              cell c belonging to string c + j * N / 4; the string's bit
              length is the byte value times ``lscale`` (8 for the decode
              emission's symbol counts, 1 for the encode packer's raw bit
              lengths <= 32).
    N a power of two >= 512; OUTW a multiple of 128.  Same return contract
    as concat_words_ovf.
    """
    B, N = level0.shape
    assert N >= 512 and N & (N - 1) == 0, N
    assert OUTW % 128 == 0, OUTW
    gb = _gb_for(B)
    Bp = -(-B // gb) * gb
    if Bp != B:
        level0 = jnp.pad(level0, ((0, Bp - B), (0, 0)))
        gcpacked = jnp.pad(gcpacked, ((0, Bp - B), (0, 0)))
    words, ovf = pl.pallas_call(
        _concat_kernel_body(N, OUTW, capw, lens_packed=True, lscale=lscale,
                            gb=gb),
        grid=(Bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N // 512, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, OUTW // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, OUTW // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(level0.reshape(Bp, N // 128, 128),
      gcpacked.reshape(Bp, N // 512, 128))
    return (words.reshape(Bp, OUTW)[:B],
            jnp.max(ovf, axis=(1, 2))[:B] > 0)
