"""Batched TPU decode kernels (JAX/XLA).

The reference decode walk is inherently sequential *within* a block — bit
n+1's tree position depends on bit n (src/decoder.c:34-96).  The TPU design
removes that dependency in two moves:

  1. **Per-position code resolution** — for *every* bit position p of the
     payload, resolve "if a codeword started at p, which symbol and how many
     bits?" by walking the (<= 513-node) tree over the 32-bit window at p.
     All positions walk in parallel; the walk depth is bounded by the tree
     depth (<= 32 on the fast path, matching the encoder).

  2. **Pointer-jump emission** — ``next[p] = p + len[p]`` forms a linked
     list whose orbit from bit 0 is the symbol sequence.  Squaring ``next``
     8 times yields next^256; anchors every 256 symbols are chased through
     next^256, then all segments emit their 256 symbols in lockstep.  The
     sequential depth collapses from n_bits to ~(8 + n_sym/256 + 256) fused
     loop iterations, each fully vectorized over (blocks x segments).

Corruption (stepping into a missing child, decoder.c:69-71) is recorded
per-position during the walk and checked only along the emitted path, which
reproduces the reference's error semantics exactly: garbage bits beyond the
consumed span never raise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_WALK = 32  # static walk depth == encoder fast-path MAX_CODE_BITS
SEG = 256  # symbols per pointer-jump segment (2^8)


def _windows(payload_words: jax.Array, NP: int) -> jax.Array:
    """(B, W) big-endian u32 payload words -> (B, NP) 32-bit bit-windows.

    win[:, p] holds payload bits [p, p+32) with bit p as MSB.
    """
    B, W = payload_words.shape
    p = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)
    wi = p >> 5
    sh = (p & 31).astype(jnp.uint32)
    w0 = jnp.take_along_axis(payload_words, wi, axis=1)
    w1 = jnp.take_along_axis(payload_words, jnp.minimum(wi + 1, W - 1), axis=1)
    # sh == 0 must not right-shift by 32 (undefined); select explicitly.
    hi = w0 << sh
    lo = jnp.where(sh == 0, jnp.uint32(0), w1 >> (jnp.uint32(32) - sh))
    return hi | lo


def _resolve_positions(win: jax.Array, left: jax.Array, right: jax.Array,
                       leaf_sym: jax.Array):
    """Walk every bit position through the tree.

    ``left``/``right``: (B, NT) child node ids with missing children mapped
    to the trap node (id NT-1, self-looping, flagged); ``leaf_sym``: (B, NT)
    symbol for leaf nodes, -1 for internal, -2 for the trap.

    Returns (sym, ln, bad, fail_off): per-position decoded symbol (u8), code
    length (i32, in [1, MAX_WALK]), a "corrupt-if-on-path" flag, and the
    in-code bit offset at which the walk failed (for error precedence: the
    reference reads a byte *then* steps, src/decoder.c:52-71, so a trap on a
    bit beyond the available payload is a short read, not corruption).
    """
    B, NP = win.shape

    def step(d, st):
        state, sym, ln, done, bad, fail_off = st
        bit = ((win >> jnp.uint32(31 - d)) & 1).astype(jnp.int32)
        nxt = jnp.where(
            bit == 1,
            jnp.take_along_axis(right, state, axis=1),
            jnp.take_along_axis(left, state, axis=1),
        )
        s = jnp.take_along_axis(leaf_sym, nxt, axis=1)
        hit_trap = ~done & (s == -2)
        hit_leaf = ~done & (s >= 0)
        sym = jnp.where(hit_leaf, s, sym)
        ln = jnp.where(hit_leaf, d + 1, ln)
        fail_off = jnp.where(hit_trap, d, fail_off)
        bad = bad | hit_trap
        done = done | hit_leaf | hit_trap
        state = jnp.where(done, state, nxt)
        return state, sym, ln, done, bad, fail_off

    st = (
        jnp.zeros((B, NP), jnp.int32),  # root is node 0
        jnp.zeros((B, NP), jnp.int32),
        jnp.ones((B, NP), jnp.int32),
        jnp.zeros((B, NP), bool),
        jnp.zeros((B, NP), bool),
        jnp.full((B, NP), MAX_WALK, jnp.int32),
    )
    state, sym, ln, done, bad, fail_off = jax.lax.fori_loop(0, MAX_WALK, step, st)
    # Never reached a leaf within MAX_WALK: impossible for a true code start
    # when tree depth <= MAX_WALK (host guarantees), so only garbage
    # positions — but if one lands on the path, flag it.
    bad = bad | ~done
    return sym.astype(jnp.uint8), ln, bad, fail_off


@functools.partial(jax.jit, static_argnums=(5, 6))
def decode_blocks(payload_words, left, right, leaf_sym, n_sym, NP: int, A: int):
    """Decode a batch of blocks.

    payload_words: (B, W) big-endian u32; left/right/leaf_sym: (B, NT) trees
    (node 0 = root, node NT-1 = trap); n_sym: (B,) symbols to restore.
    NP: static number of bit positions (= 8 * padded payload bytes).
    A: static number of SEG-symbol segments (A * SEG >= max n_sym).

    Returns (out, end_bit, corrupt, bad_bit):
      out (B, A*SEG) u8  — decoded symbols, valid through n_sym[b],
      end_bit (B,) i32   — exclusive bit offset after the last symbol
                            (consumed payload bytes = ceil(end_bit/8),
                            matching decoder.c:89-91 pad-bit handling),
      corrupt (B,) bool  — the walk failed within the first n_sym codewords,
      bad_bit (B,) i32   — global bit index of the failing bit; the host maps
                            it to BTREE_CORRUPTED (bit within the available
                            payload) or READ_WRITE (bit beyond it), matching
                            the reference's read-then-step ordering.
    """
    B = payload_words.shape[0]
    win = _windows(payload_words, NP)
    sym, ln, bad, fail_off = _resolve_positions(win, left, right, leaf_sym)
    nxt = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1) + ln, NP - 1
    )

    # next^SEG by repeated squaring (SEG = 2^8).
    jump = nxt
    for _ in range(8):
        jump = jnp.take_along_axis(jump, jump, axis=1)

    # Anchor m = bit position of symbol m*SEG.
    def anchor_step(carry, _):
        pos = carry
        nxt_pos = jnp.take_along_axis(jump, pos[:, None], axis=1)[:, 0]
        return nxt_pos, pos

    _, anchors = jax.lax.scan(
        anchor_step, jnp.zeros((B,), jnp.int32), None, length=A
    )
    anchors = anchors.T  # (B, A)

    # Lockstep emission across all segments.
    def emit_step(carry, _):
        pos = carry  # (B, A)
        s = jnp.take_along_axis(sym, pos, axis=1)
        b = jnp.take_along_axis(bad, pos, axis=1)
        nx = jnp.take_along_axis(nxt, pos, axis=1)
        return nx, (s, b, pos)

    end_pos, (syms, bads, poss) = jax.lax.scan(emit_step, anchors, None, length=SEG)
    # syms: (SEG, B, A) -> out[b, m*SEG + t] = syms[t, b, m]
    out = jnp.transpose(syms, (1, 2, 0)).reshape(B, A * SEG)
    bad_path = jnp.transpose(bads, (1, 2, 0)).reshape(B, A * SEG)
    pos_path = jnp.transpose(poss, (1, 2, 0)).reshape(B, A * SEG)

    idx = jax.lax.broadcasted_iota(jnp.int32, (B, A * SEG), 1)
    used = idx < n_sym[:, None]
    bad_used = bad_path & used
    corrupt = jnp.any(bad_used, axis=1)
    # First failing codeword (argmax of bool = first True) and the global
    # index of the bit whose read/step failed.
    first_bad = jnp.argmax(bad_used, axis=1).astype(jnp.int32)
    bad_pos = jnp.take_along_axis(pos_path, first_bad[:, None], axis=1)
    bad_off = jnp.take_along_axis(fail_off, bad_pos, axis=1)
    bad_bit = (bad_pos + bad_off)[:, 0]

    # end_bit = next[ position of symbol n_sym-1 ].
    last_pos = jnp.take_along_axis(pos_path, n_sym[:, None] - 1, axis=1)
    end_bit = jnp.take_along_axis(nxt, last_pos, axis=1)[:, 0]
    return out, end_bit, corrupt, bad_bit
