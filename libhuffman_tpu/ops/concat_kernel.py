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
    (P >= 256) the buffer is plane-major ((cap, P/128, 128): word-barrel
    shifts are leading-axis rolls); at P = 128 the buffer transposes once
    to string-major ((P, cap): shifts become static lane rolls).

Buffer size is exactly N words at every level (P * cap == N, 32-bit codes
worst case), so there is no capacity clamp and no overflow path at all —
this retires the encode packer's capw/redo machinery when the kernel path
is taken.

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


def _concat_kernel_body(N: int, OUTW: int):
    n = N.bit_length() - 1

    def kernel(w_ref, l_ref, out_ref):
        x = w_ref[0].reshape(1, N // 128, 128)      # plane-major, cap=1
        lens = l_ref[0]                              # (N/128, 128)
        P, cap = N, 1

        # Plane-major levels: strings split across row halves.
        while P >= 256:
            xv = x.reshape(cap, 2, P // 256, 128)
            a = xv[:, 0]
            b = xv[:, 1]
            lv = lens.reshape(2, P // 256, 128)
            la, lb = lv[0], lv[1]
            z = jnp.zeros_like(b)
            b2 = jnp.concatenate([b, z], axis=0)     # (2cap, P/256, 128)
            b2 = _word_barrel(b2, la >> 5, 0, cap)
            b2 = _bit_shift(b2, la & 31, 0)
            x = jnp.concatenate([a, jnp.zeros_like(a)], axis=0) | b2
            lens = la + lb
            P //= 2
            cap *= 2

        # P == 128: switch to string-major (strings on sublanes).
        x = jnp.transpose(x.reshape(cap, 128))       # (128, cap)
        lens = jnp.transpose(lens.reshape(1, 128))   # (128, 1)

        # Row-sliced halving while the slice offsets stay sublane-tile
        # aligned (P//2 a multiple of 8); Mosaic rejects lane ops on
        # vectors whose sublane offset is not 0 mod 8.
        while P >= 16:
            a = x[: P // 2]
            b = x[P // 2:]
            la = lens[: P // 2]
            lb = lens[P // 2:]
            b2 = jnp.concatenate([b, jnp.zeros_like(b)], axis=1)
            b2 = _word_barrel(b2, la >> 5, 1, cap)
            b2 = _bit_shift(b2, la & 31, 1)
            x = jnp.concatenate([a, jnp.zeros_like(a)], axis=1) | b2
            lens = la + lb
            P //= 2
            cap *= 2

        # Last three levels (8 strings left) on a fixed-width canvas.
        # Rows are consumed as sublane-replicated broadcasts (replication
        # erases the offending sublane offsets) and string lengths become
        # traced scalars; capacity truncates at the output budget — sound
        # because content only ever moves toward higher words.
        FIN = min(N, max(OUTW, cap))
        if FIN > cap:
            x = jnp.concatenate(
                [x, jnp.zeros((8, FIN - cap), jnp.uint32)], axis=1)
        else:
            x = x[:, :FIN]
        # Word placement per pair is a single DYNAMIC lane roll
        # (pltpu.roll with a traced scalar shift) + wrap mask — not a
        # log2(FIN)-step select barrel: the canvas levels dominated the
        # kernel's VMEM traffic (~46 full-canvas ops per pair; now ~8).
        riota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        laneF = jax.lax.broadcasted_iota(jnp.int32, (8, FIN), 1)
        lvals = [lens[k, 0] for k in range(8)]
        while P >= 2:
            xnew = jnp.zeros((8, FIN), jnp.uint32)
            lnew = []
            for k in range(P // 2):
                a = jnp.broadcast_to(x[k:k + 1, :], (8, FIN))
                b = jnp.broadcast_to(x[k + P // 2:k + P // 2 + 1, :],
                                     (8, FIN))
                la = lvals[k]
                # Clamp: content past the output budget truncates (sound,
                # content only moves toward higher words); FIN masks fully.
                s = jnp.minimum(la >> 5, FIN)
                b = jnp.where(laneF >= s, pltpu.roll(b, s, axis=1), 0)
                prev = jnp.where(laneF >= 1, pltpu.roll(b, 1, axis=1), 0)
                ru = jnp.uint32(la & 31)
                b = (b >> ru) | ((prev << 1) << (jnp.uint32(31) - ru))
                merged = a | b
                xnew = jnp.where(riota == k, merged, xnew)
                lnew.append(la + lvals[k + P // 2])
            x = xnew
            lvals = lnew + lvals[P // 2:]
            P //= 2

        out_ref[0] = x[0:1, :OUTW].reshape(OUTW // 128, 128)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def concat_words(level0: jax.Array, lens: jax.Array, OUTW: int) -> jax.Array:
    """Concatenate N variable-length bitstrings per block.

    level0: (B, N) u32 — string p left-aligned (MSB-first), bits past its
            length zero; lens: (B, N) i32 bit lengths (0 = empty), each
            <= 32.  N a power of two >= 256; OUTW a multiple of 128.
    Returns (B, OUTW) u32 big-endian words of the concatenation (entries
    past the total length are zero).
    """
    B, N = level0.shape
    assert N >= 256 and N & (N - 1) == 0, N
    assert OUTW % 128 == 0, OUTW
    w = bitrev_permute(level0)
    l = bitrev_permute(lens.astype(jnp.int32))
    return pl.pallas_call(
        _concat_kernel_body(N, OUTW),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUTW // 128, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUTW // 128, 128), jnp.uint32),
        interpret=_interpret(),
    )(w.reshape(B, N // 128, 128), l.reshape(B, N // 128, 128)
      ).reshape(B, OUTW)
