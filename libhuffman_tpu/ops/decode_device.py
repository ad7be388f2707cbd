"""Batched TPU decode kernels (JAX/XLA).

The reference decode walk is inherently sequential *within* a block — bit
n+1's tree position depends on bit n (src/decoder.c:34-96).  The TPU design
removes that dependency in three moves:

  1. **12-bit LUT** — per block, one 4096-entry table maps "the next 12
     payload bits" to (symbol, code length, corrupt flag), or to the tree
     state reached after 12 bits for deeper codes.  Built on-device with a
     12-step walk over 4096 lanes (trivial), it resolves the overwhelming
     majority of positions with a single gather.

  2. **Per-position resolution** — for *every* bit position p, "if a codeword
     started at p, which symbol / how long?" via the LUT; the rare positions
     whose window escapes the LUT (code deeper than 12 bits) are compacted
     with a sized nonzero and walked individually for up to MAX_WALK-12 more
     steps.  All positions resolve in parallel.

  3. **Pointer-jump emission** — ``next[p] = p + len[p]`` forms a linked
     list whose orbit from bit 0 is the symbol sequence.  Squaring ``next``
     8 times yields next^256; anchors every 256 symbols are chased through
     next^256, then all segments emit their 256 symbols in lockstep.  The
     sequential depth collapses from n_bits to ~(8 + n_sym/256 + 256) fused
     loop iterations, each fully vectorized over (blocks x segments).

Tables are bit-packed so every step costs one gather:
  * tree node:  left(11) | right(11) | symcode(9)   [symcode: 0..255 leaf
                symbol, 256 internal, 257 trap/missing-child]
  * LUT entry:  ln(5) | sym(8) | state(11) | bad(1) [ln==0 => escape]
  * meta:       sym(8) | bad(1) | ln(6)             [per bit position]

Corruption (stepping into a missing child, decoder.c:69-71) is recorded
per-position and checked only along the emitted path, reproducing the
reference's error semantics: garbage bits beyond the consumed span never
raise, and a failing bit beyond the available payload is a short read
rather than corruption (read-then-step ordering, decoder.c:52-71).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_WALK = 32  # static walk depth == encoder fast-path MAX_CODE_BITS
SEG = 256  # symbols per pointer-jump segment (2^8)
LUT_BITS = 12

_SYM_INTERNAL = 256
_SYM_TRAP = 257


def pack_tree(left: jax.Array, right: jax.Array, symcode: jax.Array) -> jax.Array:
    """(B, NT) children + symcode -> packed uint32 node table."""
    return (
        left.astype(jnp.uint32)
        | (right.astype(jnp.uint32) << 11)
        | (symcode.astype(jnp.uint32) << 22)
    )


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
    hi = w0 << sh
    lo = jnp.where(sh == 0, jnp.uint32(0), w1 >> (jnp.uint32(32) - sh))
    return hi | lo


def _walk(tree: jax.Array, state, win, start_bit: int, n_steps: int):
    """Generic packed-table walk: from ``state``, consume ``win`` bits
    [start_bit, start_bit+n_steps).  Returns (state, sym, ln, done, bad,
    fail_off) where ln counts bits consumed *including* start_bit offset.
    """
    sym = jnp.zeros_like(state)
    ln = jnp.zeros_like(state)
    done = jnp.zeros(state.shape, bool)
    bad = jnp.zeros(state.shape, bool)
    fail_off = jnp.zeros_like(state)

    def step(d, st):
        state, sym, ln, done, bad, fail_off = st
        bit = (win >> jnp.uint32(31 - start_bit - d)) & 1
        node = jnp.take_along_axis(tree, state, axis=-1)
        nxt = jnp.where(bit == 1, (node >> 11) & 0x7FF, node & 0x7FF).astype(
            jnp.int32
        )
        child = jnp.take_along_axis(tree, nxt, axis=-1)
        sc = (child >> 22).astype(jnp.int32)
        hit_trap = ~done & (sc == _SYM_TRAP)
        hit_leaf = ~done & (sc < 256)
        sym = jnp.where(hit_leaf, sc, sym)
        ln = jnp.where(hit_leaf, start_bit + d + 1, ln)
        fail_off = jnp.where(hit_trap, start_bit + d, fail_off)
        bad = bad | hit_trap
        done = done | hit_leaf | hit_trap
        state = jnp.where(done, state, nxt)
        return state, sym, ln, done, bad, fail_off

    return jax.lax.fori_loop(0, n_steps, step, (state, sym, ln, done, bad, fail_off))


def _build_lut(tree: jax.Array):
    """Per-block 2^LUT_BITS-entry lookup table, packed as
    ln(5) | sym(8)<<5 | state(11)<<13 | bad(1)<<24; ln==0 means escape
    (code longer than LUT_BITS — continue walking from ``state``)."""
    B, NT = tree.shape
    v = jax.lax.broadcasted_iota(jnp.uint32, (B, 1 << LUT_BITS), 1) << (32 - LUT_BITS)
    state0 = jnp.zeros((B, 1 << LUT_BITS), jnp.int32)
    state, sym, ln, done, bad, fail_off = _walk(tree, state0, v, 0, LUT_BITS)
    ln_field = jnp.where(bad, fail_off, jnp.where(done, ln, 0))
    # For bad entries, ln(5) carries the fail offset; sym field unused.
    packed = (
        jnp.where(done & ~bad, ln, jnp.where(bad, ln_field, 0)).astype(jnp.uint32)
        & 0x1F
    )
    packed = packed | ((sym.astype(jnp.uint32) & 0xFF) << 5)
    packed = packed | ((state.astype(jnp.uint32) & 0x7FF) << 13)
    packed = packed | (bad.astype(jnp.uint32) << 24)
    # Distinguish "bad" (walked into trap) from "escape" (not done): both may
    # have ln==0; the bad bit disambiguates.
    return packed


def _resolve_positions(win: jax.Array, tree: jax.Array, esc_cap: int):
    """Resolve every bit position to packed meta sym(8) | bad(1)<<8 |
    ln(6)<<9 | fail_off(6)<<15, plus the count of LUT escapes that exceeded
    the compaction budget (0 means fully resolved)."""
    B, NP = win.shape
    lut = jax.lax.optimization_barrier(_build_lut(tree))
    v = (win >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    e = jnp.take_along_axis(lut, v, axis=1)
    ln = (e & 0x1F).astype(jnp.int32)
    sym = ((e >> 5) & 0xFF).astype(jnp.int32)
    state12 = ((e >> 13) & 0x7FF).astype(jnp.int32)
    bad = ((e >> 24) & 1).astype(bool)
    fail_off = jnp.where(bad, ln, 0)
    ln = jnp.where(bad, 0, ln)

    # Escapes: no leaf and no trap within LUT_BITS — deep codes only.
    esc = (~bad) & (ln == 0)
    esc_count = jnp.sum(esc)
    flat_esc = esc.ravel()
    idx = jnp.nonzero(flat_esc, size=esc_cap, fill_value=B * NP)[0]
    valid = idx < B * NP
    idx_safe = jnp.where(valid, idx, 0)
    b_of = (idx_safe // NP).astype(jnp.int32)
    # Flat gathers for the escape walk (1-D lanes).
    win_e = win.ravel()[idx_safe]
    st_e = state12.ravel()[idx_safe]
    NT = tree.shape[1]
    tree_flat = tree.ravel()
    base = b_of * NT

    def estep(d, st):
        state, sym, ln, done, bad, fail_off = st
        bit = (win_e >> jnp.uint32(31 - LUT_BITS - d)) & 1
        node = tree_flat[base + state]
        nxt = jnp.where(bit == 1, (node >> 11) & 0x7FF, node & 0x7FF).astype(jnp.int32)
        child = tree_flat[base + nxt]
        sc = (child >> 22).astype(jnp.int32)
        hit_trap = ~done & (sc == _SYM_TRAP)
        hit_leaf = ~done & (sc < 256)
        sym = jnp.where(hit_leaf, sc, sym)
        ln = jnp.where(hit_leaf, LUT_BITS + d + 1, ln)
        fail_off = jnp.where(hit_trap, LUT_BITS + d, fail_off)
        bad = bad | hit_trap
        done = done | hit_leaf | hit_trap
        state = jnp.where(done, state, nxt)
        return state, sym, ln, done, bad, fail_off

    z = jnp.zeros((esc_cap,), jnp.int32)
    est = (st_e, z, z, jnp.zeros((esc_cap,), bool), jnp.zeros((esc_cap,), bool), z)
    _, sym_e, ln_e, done_e, bad_e, fail_e = jax.lax.fori_loop(
        0, MAX_WALK - LUT_BITS, estep, est
    )
    # Positions that never resolve within MAX_WALK can't be real code starts
    # (host guarantees tree depth <= MAX_WALK); treat as bad-at-last-bit.
    bad_e = bad_e | ~done_e
    fail_e = jnp.where(done_e, fail_e, MAX_WALK - 1)

    sym = sym.ravel().at[jnp.where(valid, idx, B * NP)].set(sym_e, mode="drop")
    ln = ln.ravel().at[jnp.where(valid, idx, B * NP)].set(ln_e, mode="drop")
    bad = bad.ravel().at[jnp.where(valid, idx, B * NP)].set(bad_e, mode="drop")
    fail_off = fail_off.ravel().at[jnp.where(valid, idx, B * NP)].set(
        fail_e, mode="drop"
    )
    unresolved = esc_count - jnp.sum(valid & (idx < B * NP))

    meta = (
        sym.reshape(B, NP).astype(jnp.uint32)
        | (bad.reshape(B, NP).astype(jnp.uint32) << 8)
        | (jnp.clip(ln.reshape(B, NP), 0, 63).astype(jnp.uint32) << 9)
        | (jnp.clip(fail_off.reshape(B, NP), 0, 63).astype(jnp.uint32) << 15)
    )
    return meta, unresolved


@functools.partial(jax.jit, static_argnums=(3, 4))
def decode_blocks(payload_words, tree, n_sym, NP: int, A: int):
    """Decode a batch of blocks.

    payload_words: (B, W) big-endian u32; tree: (B, NT) packed node table
    (node 0 = root); n_sym: (B,) symbols to restore.
    NP: static bit-position count (= 8 * padded payload bytes).
    A: static SEG-symbol segment count (A * SEG >= max n_sym).

    Returns (out, end_bit, corrupt, bad_bit, unresolved):
      out (B, A*SEG) u8  — decoded symbols, valid through n_sym[b],
      end_bit (B,) i32   — exclusive bit offset after the last symbol
                            (consumed payload bytes = ceil(end_bit/8)),
      corrupt (B,) bool  — walk failed within the first n_sym codewords,
      bad_bit (B,) i32   — global bit index of the failing bit,
      unresolved i32     — escape-compaction overflow (>0: host must redo
                            the whole batch; adversarial-only).
    """
    B = payload_words.shape[0]
    # optimization_barrier between stages: without it XLA rematerializes
    # producers (windows, the LUT, meta) inside consumer loops, multiplying
    # the work by the loop trip count.
    win = jax.lax.optimization_barrier(_windows(payload_words, NP))
    esc_cap = max(1024, (B * NP) // 8)
    meta, unresolved = _resolve_positions(win, tree, esc_cap)
    meta = jax.lax.optimization_barrier(meta)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)
    ln = ((meta >> 9) & 63).astype(jnp.int32)
    nxt = jnp.minimum(pos + jnp.maximum(ln, 1), NP - 1)
    nxt = jax.lax.optimization_barrier(nxt)

    # next^SEG by repeated squaring (SEG = 2^8).
    jump = nxt
    for _ in range(8):
        jump = jax.lax.optimization_barrier(
            jnp.take_along_axis(jump, jump, axis=1)
        )

    def anchor_step(carry, _):
        nxt_pos = jnp.take_along_axis(jump, carry[:, None], axis=1)[:, 0]
        return nxt_pos, carry

    _, anchors = jax.lax.scan(
        anchor_step, jnp.zeros((B,), jnp.int32), None, length=A
    )
    anchors = anchors.T  # (B, A)

    def emit_step(carry, _):
        p = carry  # (B, A)
        m = jnp.take_along_axis(meta, p, axis=1)
        l = jnp.maximum(((m >> 9) & 63).astype(jnp.int32), 1)
        nx = jnp.minimum(p + l, NP - 1)
        return nx, (m, p)

    _, (metas, poss) = jax.lax.scan(emit_step, anchors, None, length=SEG)
    # metas: (SEG, B, A) -> path[b, m*SEG + t] = metas[t, b, m]
    meta_path = jnp.transpose(metas, (1, 2, 0)).reshape(B, A * SEG)
    pos_path = jnp.transpose(poss, (1, 2, 0)).reshape(B, A * SEG)
    out = (meta_path & 0xFF).astype(jnp.uint8)
    bad_path = ((meta_path >> 8) & 1).astype(bool)

    idx = jax.lax.broadcasted_iota(jnp.int32, (B, A * SEG), 1)
    used = idx < n_sym[:, None]
    bad_used = bad_path & used
    corrupt = jnp.any(bad_used, axis=1)
    first_bad = jnp.argmax(bad_used, axis=1).astype(jnp.int32)
    bad_meta = jnp.take_along_axis(meta_path, first_bad[:, None], axis=1)[:, 0]
    bad_pos = jnp.take_along_axis(pos_path, first_bad[:, None], axis=1)[:, 0]
    bad_bit = bad_pos + ((bad_meta >> 15) & 63).astype(jnp.int32)

    last_pos = jnp.take_along_axis(pos_path, n_sym[:, None] - 1, axis=1)
    last_meta = jnp.take_along_axis(meta_path, n_sym[:, None] - 1, axis=1)
    end_bit = (
        last_pos[:, 0] + jnp.maximum(((last_meta[:, 0] >> 9) & 63).astype(jnp.int32), 1)
    )
    return out, end_bit, corrupt, bad_bit, unresolved
