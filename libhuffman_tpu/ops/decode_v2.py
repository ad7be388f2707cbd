"""Batched TPU decode v2: gather-free chain resolution.

The reference decode walk is bit-serial within a block (src/decoder.c:34-96).
Round 1 parallelized it with per-position resolution + pointer jumping, but
pointer jumping is built on per-lane gathers, which XLA lowers to ~0.1 G/s
scalar loops on TPU (measured, bench/probe_primitives.py) — the whole decoder
ran at 0.0005 GB/s.  v2 keeps the per-position resolution (as one-hot MXU
lookups, ~6 G/s measured) and replaces pointer jumping with a *linear boolean
recurrence*:

    is_start(p) = OR over l in 1..MAXL of ( is_start(p-l) AND len(p-l) == l )

with is_start(0) = 1.  The dependency window is bounded by the batch's
maximum code length MAXL, so the whole chain state is one u32 per block and
the recurrence runs as a tiny Pallas kernel — sequential over positions
*within* a block (VPU-register state, ~4*MAXL ops/position), parallel across
blocks in vector lanes.  No gathers anywhere on the chain.

Pipeline per batch (B blocks x NP bit positions):

  1. windows     — win32(p) = payload bits [p, p+32), elementwise interleave.
  2. LUT build   — per block, a 2^13-entry table: first 13 bits -> packed
                   (len, symbol, state-after-13-bits, corrupt flag); built by
                   a 13-step one-hot walk over the packed node table.
  3. resolve     — meta(p) for every position via one one-hot LUT lookup;
                   codes deeper than 13 bits escape to (4): their count is
                   tiny (the fraction of *random* windows that reach depth
                   13+ is ~1%), so full-width walking would waste 10-20x.
  4. escape fix  — escaped positions are compacted per 4096-position segment
                   with an equality-matmul (rank one-hot contraction, exact
                   in bf16 byte channels), walked to depth MAXL with one-hot
                   tree lookups, and merged back with a T=ESCAP one-hot
                   gather.  Segment overflow (adversarial) flags the batch
                   for the host path.
  5. recurrence  — the Pallas kernel: is_start bits for every position.
  6. emission    — symbols of start positions, in order: groups of 8
                   positions prepack into one word (<= 4 starts each, since
                   every multi-symbol tree has min code length 2 — the unary
                   root, SURVEY.md §2.8), then the byte strings concatenate
                   through the merge tree (ops/pack_tree) with capacity
                   clamped to the output budget.
  7. bookkeeping — end bit, corrupt flag and failing bit via group-rank
                   arithmetic (reproduces decoder.c:52-91 semantics:
                   read-then-step precedence, pad bits ignored).

Blocks whose tree admits 1-bit codes (a crafted depth-1 leaf beside a
sibling; the encoder itself never emits them, src/tree.c:410-413) or deeper
than MAXL=32 are flagged and decoded by the host/native exact path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu_gather, pack_tree

LUT_BITS = 12
MAX_WALK = 32  # absolute device ceiling; deeper trees -> host
SEG = 4096  # escape-compaction segment (positions)
ESCAP = 128  # compacted escapes per segment (overflow -> host)
NT_PAD = 1040  # packed node table padded for 16-way one-hot decomposition

_SYM_INTERNAL = 256
_SYM_TRAP = 257


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------------
# Stage 1: bit windows
# --------------------------------------------------------------------------

def windows32(payload_words: jax.Array) -> jax.Array:
    """(B, W) big-endian u32 payload words -> (B, 32*W) 32-bit windows.

    win[:, p] holds payload bits [p, p+32) with bit p as the MSB.  Pure
    elementwise shifts — one (w << s | next >> 32-s) per phase s, interleaved
    by reshape (no gathers; round 1 used take_along_axis here).
    """
    B, W = payload_words.shape
    w = payload_words
    wn = jnp.concatenate([w[:, 1:], jnp.zeros((B, 1), jnp.uint32)], axis=1)
    parts = [w]
    for s in range(1, 32):
        parts.append((w << s) | (wn >> (32 - s)))
    return jnp.stack(parts, axis=2).reshape(B, 32 * W)


# --------------------------------------------------------------------------
# Stage 2+3: per-position resolution
# --------------------------------------------------------------------------

def _tree_desc(tree: jax.Array, idx: jax.Array) -> jax.Array:
    """One-hot lookup of packed node descriptors (left|right|symcode)."""
    return mxu_gather.gather_u32(tree, idx, n_bytes=4)


def build_lut(tree: jax.Array):
    """(B, NT_PAD) packed nodes -> per-block 2^LUT_BITS-entry tables.

    Returns (lut, lut_state, minlen):
      lut (B, NL) u16:  sym(8) | lnfail(4)<<8 | bad(1)<<12 — lnfail is the
        code length (1..LUT_BITS), or the failing bit offset when bad, or 0
        for an escape (code deeper than LUT_BITS);
      lut_state (B, NL) u16: node reached after LUT_BITS bits (escape
        continuation point; gathered only on the compacted escape set);
      minlen (B,): shortest code length visible in the table (a value < 2
        means the tree admits 1-bit codes — the host path takes over).
    """
    B = tree.shape[0]
    NL = 1 << LUT_BITS
    v = jax.lax.broadcasted_iota(jnp.uint32, (B, NL), 1) << (32 - LUT_BITS)
    state = jnp.zeros((B, NL), jnp.int32)
    desc = _tree_desc(tree, state)
    sym = jnp.zeros((B, NL), jnp.int32)
    ln = jnp.zeros((B, NL), jnp.int32)
    done = jnp.zeros((B, NL), bool)
    bad = jnp.zeros((B, NL), bool)
    fail = jnp.zeros((B, NL), jnp.int32)
    for d in range(LUT_BITS):
        bit = ((v >> jnp.uint32(31 - d)) & 1).astype(jnp.int32)
        nxt = jnp.where(bit == 1, (desc >> 11) & 0x7FF, desc & 0x7FF).astype(
            jnp.int32
        )
        ndesc = _tree_desc(tree, nxt)
        sc = (ndesc >> 22).astype(jnp.int32)
        hit_trap = ~done & (sc == _SYM_TRAP)
        hit_leaf = ~done & (sc < 256)
        sym = jnp.where(hit_leaf, sc, sym)
        ln = jnp.where(hit_leaf, d + 1, ln)
        fail = jnp.where(hit_trap, d, fail)
        bad = bad | hit_trap
        done = done | hit_leaf | hit_trap
        state = jnp.where(done, state, nxt)
        desc = jnp.where(done, desc, ndesc)
    lut = (
        sym.astype(jnp.uint16)
        | (jnp.where(bad, fail, ln).astype(jnp.uint16) << 8)
        | (bad.astype(jnp.uint16) << 12)
    )
    lut_state = state.astype(jnp.uint16)
    minlen = jnp.min(jnp.where(done & ~bad, ln, 64), axis=1)
    return lut, lut_state, minlen


def resolve(win: jax.Array, tree: jax.Array, lut: jax.Array,
            lut_state: jax.Array, MAXL: int):
    """Per-position meta for every bit position.

    Returns meta (B, NP) u32 packed as sym(8) | ln(6)<<8 | bad(1)<<14 |
    fail(6)<<15, plus esc_ovf (scalar bool: escape compaction overflowed —
    host must redo the batch; adversarial streams only).
    """
    B, NP = win.shape
    idx = (win >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    pieces = jnp.stack(
        [(lut & 0xFF).astype(jnp.uint8), (lut >> 8).astype(jnp.uint8)],
        axis=-1,
    )
    g = mxu_gather.gather_bytes(pieces, idx, T2=64)
    sym = g[..., 0]
    ln = (g[..., 1] & 0xF).astype(jnp.int32)
    bad = ((g[..., 1] >> 4) & 1).astype(bool)
    fail = jnp.where(bad, ln, 0)
    ln = jnp.where(bad, 0, ln)

    esc_ovf = jnp.zeros((), bool)
    if MAXL > LUT_BITS:
        esc = (~bad) & (ln == 0)
        ln, sym, bad, fail, esc_ovf = _fix_escapes(
            win, tree, esc, lut_state, ln, sym, bad, fail, MAXL
        )
    else:
        # Escape at depth LUT_BITS in a <=LUT_BITS batch: unreachable subtree
        # claims (host guarantees depth <= MAXL); mark corrupt-at-last-bit.
        esc = (~bad) & (ln == 0)
        bad = bad | esc
        fail = jnp.where(esc, LUT_BITS - 1, fail)

    meta = (
        sym.astype(jnp.uint32)
        | (jnp.clip(ln, 0, 63).astype(jnp.uint32) << 8)
        | (bad.astype(jnp.uint32) << 14)
        | (jnp.clip(fail, 0, 63).astype(jnp.uint32) << 15)
    )
    return meta, esc_ovf


def _fix_escapes(win, tree, esc, lut_state, ln, sym, bad, fail, MAXL: int):
    """Resolve codes deeper than LUT_BITS without full-width tree walks.

    Escaped positions compact per SEG-position segment via an equality
    matmul over their segment-local rank (one-hot contraction; byte channels
    keep bf16 exact), look up their continuation state on the compacted set,
    walk to depth MAXL with one-hot lookups, and expand back with a T=ESCAP
    one-hot gather.
    """
    B, NP = win.shape
    seg = min(SEG, NP)
    assert NP % seg == 0, (NP, seg)
    nseg_pb = NP // seg
    NSEG = B * nseg_pb
    esc_f = esc.reshape(NSEG, seg)
    r = jnp.cumsum(esc_f.astype(jnp.int32), axis=1) - esc_f.astype(jnp.int32)
    seg_cnt = r[:, -1] + esc_f[:, -1].astype(jnp.int32)
    esc_ovf = jnp.any(seg_cnt > ESCAP)

    # Channels to compact: the LUT index (LUT_BITS bits, 2 bytes, to pick up
    # the continuation state cheaply on the compacted set) and the window
    # bits [LUT_BITS, MAXL) (<= 20 bits, 3 bytes); byte-sized pieces stay
    # exact through the bf16 contraction.
    w12 = (win >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    w12 = w12.reshape(NSEG, seg)
    wext = (win >> jnp.uint32(32 - MAXL)) & jnp.uint32(
        (1 << (MAXL - LUT_BITS)) - 1
    )
    wext = wext.reshape(NSEG, seg).astype(jnp.int32)
    NCH = 5
    T2 = 16
    T1 = ESCAP // T2
    lo = r & (T2 - 1)
    hi = r >> 4

    def compact_slab(args):
        esc_s, lo_s, hi_s, st_s, wx_s = args
        chans = jnp.stack(
            [
                st_s & 0xFF, st_s >> 8,
                wx_s & 0xFF, (wx_s >> 8) & 0xFF, (wx_s >> 16) & 0xFF,
            ],
            axis=2,
        )  # (slab, seg, NCH)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T2), 2)
        sel = esc_s[:, :, None] & (lo_s[:, :, None] == lo_iota)
        A = jnp.where(sel[:, :, :, None], chans[:, :, None, :], 0).astype(
            jnp.bfloat16
        ).reshape(esc_s.shape[0], seg, T2 * NCH)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T1), 2)
        Bm = (esc_s[:, :, None] & (hi_s[:, :, None] == hi_iota)).astype(
            jnp.bfloat16
        )
        comp = jax.lax.dot_general(
            Bm, A, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(esc_s.shape[0], T1, T2, NCH).astype(jnp.int32)
        return comp.reshape(esc_s.shape[0], ESCAP, NCH)

    # Slab the contraction so the one-hot operand never materializes at
    # full batch size (it is seg*T2*NCH bf16 per segment).
    SLAB = max(1, min(NSEG, (1 << 24) // seg))
    if NSEG % SLAB:
        SLAB = 1
    xs = tuple(
        x.reshape(NSEG // SLAB, SLAB, seg)
        for x in (esc_f, lo, hi, w12, wext)
    )
    comp = jax.lax.map(compact_slab, xs).reshape(NSEG, ESCAP, NCH)
    c_w12 = comp[:, :, 0] | (comp[:, :, 1] << 8)
    c_wext = comp[:, :, 2] | (comp[:, :, 3] << 8) | (comp[:, :, 4] << 16)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (NSEG, ESCAP), 1)
    live = k_iota < seg_cnt[:, None]

    # Walk the compacted escapes: per block rows so trees stay per-row.
    def reblk(x):
        return x.reshape(B, nseg_pb * ESCAP)

    w_w12, w_wext, w_live = reblk(c_w12), reblk(c_wext), reblk(live)
    w_state = mxu_gather.gather_u32(
        lut_state.astype(jnp.uint32), jnp.where(w_live, w_w12, 0), n_bytes=2,
        T2=64,
    ).astype(jnp.int32)
    desc = _tree_desc(tree, jnp.where(w_live, w_state, 0))
    w_sym = jnp.zeros_like(w_state)
    w_ln = jnp.zeros_like(w_state)
    w_done = ~w_live
    w_bad = jnp.zeros(w_state.shape, bool)
    w_fail = jnp.zeros_like(w_state)
    EXT = MAXL - LUT_BITS
    for d in range(EXT):
        bit = (w_wext >> (EXT - 1 - d)) & 1
        nxt = jnp.where(bit == 1, (desc >> 11) & 0x7FF, desc & 0x7FF).astype(
            jnp.int32
        )
        ndesc = _tree_desc(tree, nxt)
        sc = (ndesc >> 22).astype(jnp.int32)
        hit_trap = ~w_done & (sc == _SYM_TRAP)
        hit_leaf = ~w_done & (sc < 256)
        w_sym = jnp.where(hit_leaf, sc, w_sym)
        w_ln = jnp.where(hit_leaf, LUT_BITS + d + 1, w_ln)
        w_fail = jnp.where(hit_trap, LUT_BITS + d, w_fail)
        w_bad = w_bad | hit_trap
        w_done = w_done | hit_leaf | hit_trap
        desc = jnp.where(w_done, desc, ndesc)
    # Codes deeper than MAXL never resolve: can't be real starts; mark
    # corrupt at the last examined bit (host guarantees depth <= MAXL).
    w_bad = w_bad | (~w_done & w_live)
    w_fail = jnp.where(w_done | ~w_live, w_fail, MAXL - 1)

    # Expand back: every escaped position picks entry rank(p) of its segment.
    res = (
        w_ln.astype(jnp.uint32)
        | (w_sym.astype(jnp.uint32) << 6)
        | (w_bad.astype(jnp.uint32) << 14)
        | (jnp.clip(w_fail, 0, 63).astype(jnp.uint32) << 15)
    ).reshape(NSEG, ESCAP)
    back = mxu_gather.gather_u32(
        res, jnp.where(esc_f, jnp.minimum(r, ESCAP - 1), 0), n_bytes=4, T2=16
    )
    back = back.reshape(B, NP)
    e_ln = (back & 63).astype(jnp.int32)
    e_sym = ((back >> 6) & 0xFF).astype(jnp.int32)
    e_bad = ((back >> 14) & 1).astype(bool)
    e_fail = ((back >> 15) & 63).astype(jnp.int32)
    ln = jnp.where(esc, jnp.where(e_bad, 0, e_ln), ln)
    sym = jnp.where(esc, e_sym, sym)
    fail = jnp.where(esc, jnp.where(e_bad, e_fail, 0), fail)
    bad = jnp.where(esc, e_bad, bad)
    return ln, sym, bad, fail, esc_ovf


# --------------------------------------------------------------------------
# Stage 5: the chain recurrence (Pallas kernel)
# --------------------------------------------------------------------------

SP = 512  # positions per kernel grid step


def _rec_kernel_body(MAXL: int, SB: int):
    def kernel(len_ref, out_ref, st_ref, lw_ref):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            st_ref[0] = jnp.zeros((SB, 128), jnp.uint32)
            for l in range(MAXL):
                lw_ref[l] = jnp.zeros((SB, 128), jnp.int32)

        st0 = st_ref[0]
        lw0 = tuple(lw_ref[l] for l in range(MAXL))

        def stripe(j, carry):
            st = carry[0]
            lw = carry[1:]
            word = st & 0  # u32 zeros with a concrete layout
            for t in range(32):
                # p_local = 32*j + t; is_start(p) from the lag window.
                new = st & 0
                for l in range(1, MAXL + 1):
                    m = (lw[l - 1] == l).astype(jnp.uint32)
                    new = new | (((st >> (l - 1)) & 1) & m)
                if t == 0:
                    # is_start(0) = 1: the chain starts at bit 0 (decoder.c:34).
                    new = jnp.where(first & (j == 0), jnp.uint32(1), new)
                word = word | (new << t)
                lnp = len_ref[32 * j + t]
                st = (st << 1) | new
                lw = (lnp,) + lw[:-1]
            out_ref[j] = word
            return (st,) + lw

        carry = jax.lax.fori_loop(0, SP // 32, stripe, (st0,) + lw0)
        st_ref[0] = carry[0]
        for l in range(MAXL):
            lw_ref[l] = carry[1 + l]

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def chain_starts(len_t: jax.Array, MAXL: int) -> jax.Array:
    """is_start bits for every position of every block.

    len_t: (NP, B) u8 code lengths, position-major (B a multiple of 128).
    Returns packed bits (NP // 32, B) u32 (bit t of word w = position
    32*w + t).  Sequential over positions within a block (the true data
    dependency), vectorized across blocks; state = one u32 window + MAXL
    lag registers per lane, VMEM-resident across the position grid.
    """
    NP, B = len_t.shape
    assert NP % SP == 0, (NP, B)
    B_pad = -(-B // 128) * 128
    if B_pad != B:
        len_t = jnp.pad(len_t, ((0, 0), (0, B_pad - B)))
    SB = B_pad // 128
    grid = NP // SP
    kernel = _rec_kernel_body(MAXL, SB)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SP, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SP // 32, SB, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP // 32, SB, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, SB, 128), jnp.uint32),
            pltpu.VMEM((MAXL, SB, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(len_t.astype(jnp.int32).reshape(NP, SB, 128))
    return out.reshape(NP // 32, B_pad)[:, :B]


# --------------------------------------------------------------------------
# Stage 6+7: emission and bookkeeping
# --------------------------------------------------------------------------

def _emit(start: jax.Array, sym: jax.Array, OUTW: int):
    """Symbols at start positions, in position order, densely packed.

    start/sym: (B, NP).  Groups of 8 positions hold <= 4 starts (min code
    length 2), so each group prepacks into one big-endian u32 + byte count;
    group strings then concatenate through the merge tree with capacity
    clamped to the OUTW-word output budget.

    Returns (out (B, 4*OUTW) u8, gcnt (B, NP//8) i32 group start counts).
    """
    B, NP = start.shape
    NG = NP // 8
    s8 = start.reshape(B, NG, 8)
    y8 = sym.reshape(B, NG, 8).astype(jnp.uint32)
    w = jnp.zeros((B, NG), jnp.uint32)
    cnt = jnp.zeros((B, NG), jnp.int32)
    for j in range(8):
        sj = s8[:, :, j]
        shift = (24 - 8 * cnt).astype(jnp.uint32) & 31
        w = jnp.where(sj, w | (y8[:, :, j] << shift), w)
        cnt = cnt + sj.astype(jnp.int32)
    # First three merge levels in struct-of-arrays form (2-D planes only):
    # a (B, 1, NG) entry point invites a 128x-padded layout (pack_tree).
    strings, glens = pack_tree._soa_levels(w, cnt * 8, 3)
    words, _ = pack_tree.concat_bitstrings(strings, glens, max_cap=OUTW)
    if words.shape[1] < OUTW:
        words = jnp.pad(words, ((0, 0), (0, OUTW - words.shape[1])))
    out = jnp.stack(
        [(words >> 24), (words >> 16), (words >> 8), words], axis=-1
    ).astype(jnp.uint8).reshape(B, 4 * OUTW)
    return out, cnt


def _gather_rows_small(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N) per-block scalar pick — B lookups, cold path."""
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def decode_blocks(payload_words, tree, n_sym, NP: int, OUTW: int, MAXL: int):
    """Decode a batch of blocks.

    payload_words: (B, NP//32) big-endian u32; tree: (B, NT_PAD) packed node
    table (node 0 = root); n_sym: (B,) symbols to restore.
    NP: static bit-position count; OUTW: static output u32 words per block
    (4*OUTW >= max n_sym); MAXL: static max code length bucket (<= 32).

    Returns (out, end_bit, corrupt, bad_bit, flags):
      out (B, 4*OUTW) u8 — decoded bytes, valid through n_sym[b],
      end_bit (B,) i32  — exclusive bit offset after the last symbol,
      corrupt (B,) bool — chain hit a missing child within n_sym symbols,
      bad_bit (B,) i32  — global bit index of the failing bit,
      flags: (esc_ovf scalar bool, dense_ovf (B,) bool) — host redo markers
        (escape-segment overflow / 1-bit-code tree).
    """
    B = payload_words.shape[0]
    win = jax.lax.optimization_barrier(windows32(payload_words))
    lut, lut_state, minlen = build_lut(tree)
    lut = jax.lax.optimization_barrier(lut)
    meta, esc_ovf = resolve(win, tree, lut, lut_state, MAXL)
    meta = jax.lax.optimization_barrier(meta)
    dense_ovf = minlen < 2  # crafted 1-bit-code trees: host path

    ln = ((meta >> 8) & 63).astype(jnp.uint8)
    len_t = ln.T  # (NP, B)
    start_w = chain_starts(len_t, MAXL)  # (NP//32, B)
    bit_iota = jax.lax.broadcasted_iota(jnp.uint32, (NP // 32, 32), 1)
    start = (
        ((start_w.T[:, :, None] >> bit_iota[None]) & 1).astype(bool)
    ).reshape(B, NP)
    start = jax.lax.optimization_barrier(start)

    sym = (meta & 0xFF).astype(jnp.uint8)
    out, gcnt = _emit(start, sym, OUTW)

    # --- bookkeeping ---
    lni = ((meta >> 8) & 63).astype(jnp.int32)
    grank = jnp.cumsum(gcnt, axis=1)  # inclusive, per block
    total = grank[:, -1]
    reached = total >= n_sym
    # group holding the n_sym-th start (1-based rank n_sym)
    g_star = jnp.argmax(grank >= n_sym[:, None], axis=1).astype(jnp.int32)
    g_star = jnp.where(reached, g_star, 0)
    before = jnp.where(
        g_star > 0,
        _gather_rows_small(grank, jnp.maximum(g_star - 1, 0)),
        0,
    )
    k = n_sym - before  # 1-based rank within the group, in [1, 4]
    # the 8 (start, len) pairs of group g_star
    sg = jnp.stack(
        [_gather_rows_small(start.reshape(B, NP // 8, 8)[:, :, j], g_star)
         for j in range(8)], axis=1
    ).astype(jnp.int32)  # (B, 8)
    lg = jnp.stack(
        [_gather_rows_small(lni.reshape(B, NP // 8, 8)[:, :, j], g_star)
         for j in range(8)], axis=1
    )  # (B, 8)
    csg = jnp.cumsum(sg, axis=1)
    hit = (csg == k[:, None]) & (sg == 1)
    j_star = jnp.argmax(hit, axis=1).astype(jnp.int32)
    p_star = g_star * 8 + j_star
    l_star = jnp.take_along_axis(lg, j_star[:, None], axis=1)[:, 0]
    end_bit = jnp.where(reached, p_star + l_star, NP)

    # corrupt: first bad start within the first n_sym codewords
    badp = ((meta >> 14) & 1).astype(bool) & start
    anybad = jnp.any(badp, axis=1)
    fb = jnp.argmax(badp, axis=1).astype(jnp.int32)
    # rank of fb among starts (1-based)
    gfb = fb // 8
    before_fb = jnp.where(
        gfb > 0, _gather_rows_small(grank, jnp.maximum(gfb - 1, 0)), 0
    )
    sgf = jnp.stack(
        [_gather_rows_small(start.reshape(B, NP // 8, 8)[:, :, j], gfb)
         for j in range(8)], axis=1
    ).astype(jnp.int32)
    jfb = fb - gfb * 8
    rank_fb = before_fb + jnp.sum(
        jnp.where(jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1)
                  <= jfb[:, None], sgf, 0), axis=1
    )
    corrupt = anybad & (rank_fb <= n_sym)
    fail_off = _gather_rows_small(((meta >> 15) & 63).astype(jnp.int32), fb)
    bad_bit = fb + fail_off
    # A chain that dies (stalls) before n_sym without a trap is a short read
    # signalled via end_bit = NP (host: consumed > avail -> ReadWrite).
    return out, end_bit, corrupt, bad_bit, (esc_ovf, dense_ovf)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def decode_blocks_prefix(payload_words, tree, n_sym, NP: int, OUTW: int,
                         MAXL: int, upto: int):
    """Profiling ablation: the decode pipeline truncated after stage ``upto``
    (1=windows, 2=+lut, 3=+resolve, 4=+chain, 5=+emit, 6=full), reduced to a
    checksum.  Phase cost k = t(k) - t(k-1); BENCH_PHASES=1 drives this."""
    u32 = jnp.uint32
    B = payload_words.shape[0]
    win = jax.lax.optimization_barrier(windows32(payload_words))
    if upto == 1:
        return jnp.sum(win)
    lut, lut_state, minlen = build_lut(tree)
    lut = jax.lax.optimization_barrier(lut)
    if upto == 2:
        return (jnp.sum(lut.astype(u32)) + jnp.sum(lut_state.astype(u32))
                + jnp.sum(minlen.astype(u32)))
    meta, esc_ovf = resolve(win, tree, lut, lut_state, MAXL)
    meta = jax.lax.optimization_barrier(meta)
    if upto == 3:
        return jnp.sum(meta) + esc_ovf.astype(u32)
    ln = ((meta >> 8) & 63).astype(jnp.uint8)
    start_w = chain_starts(ln.T, MAXL)
    if upto == 4:
        return jnp.sum(start_w)
    bit_iota = jax.lax.broadcasted_iota(u32, (NP // 32, 32), 1)
    start = (
        ((start_w.T[:, :, None] >> bit_iota[None]) & 1).astype(bool)
    ).reshape(B, NP)
    start = jax.lax.optimization_barrier(start)
    sym = (meta & 0xFF).astype(jnp.uint8)
    out, gcnt = _emit(start, sym, OUTW)
    if upto == 5:
        return jnp.sum(out.astype(u32)) + jnp.sum(gcnt.astype(u32))
    res = decode_blocks(payload_words, tree, n_sym, NP, OUTW, MAXL)
    out, end_bit, corrupt, bad_bit, (esc_ovf, dense_ovf) = res
    return (jnp.sum(out.astype(u32)) + jnp.sum(end_bit.astype(u32))
            + jnp.sum(corrupt.astype(u32)) + jnp.sum(bad_bit.astype(u32))
            + esc_ovf.astype(u32) + jnp.sum(dense_ovf.astype(u32)))
