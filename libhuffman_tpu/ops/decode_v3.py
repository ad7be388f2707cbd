"""Batched TPU decode v3: lane-permute resolve + fused chain/emission.

Replaces decode_v2's one-hot-MXU resolve (measured 0.3 G positions/s — the
(B, N, T1*K) f32 masked-reduce temporaries made it HBM-bound) with Pallas
kernels built on the VPU's dynamic lane permute, measured at ~146 G
lookups/s for 128-wide tables (bench/probe_r3e.py):

  kernel 1  resolve_blocks — for EVERY bit position p of every block,
            the (length, symbol | fail offset) of the codeword starting
            at p:
              windows     built in-VMEM from the payload words (no
                          materialized (B, 32*W) u32 window tensor),
              resolution  a cascade of 128-wide permute lookups over
                          host-built u16-packed tables (native
                          build_decode_tables): LUT10 (4 chunk permutes)
                          -> 128-state x 3-bit stage (4 chunks) -> a
                          64-state x 3-bit tail + up to three 32-state
                          x 3-bit tails; covers code depth <= 25
                          uniformly — no escape compaction, no device
                          LUT build.
            Terminal table entries arrive PRE-TRANSLATED from the
            native builder (DONE(15) | aux(13:6) | len(5:0); len == 0
            marks a dead/corrupt position whose aux field is the fail
            offset), so the kernel just packs ADJACENT POSITION PAIRS
            into one u32 — round-5 measurements: the chain kernel is
            load-bound, so halving its input bytes sped it ~1.7x, XLA
            transposes the pair plane at ~180 G pos/s, and storing raw
            entries killed the ~6-op in-kernel translate
            (bench/probe_r5_decode.py).
  kernel 2  chain_emit — the linear boolean recurrence
              is_start(p) = OR_l is_start(p-l) & (len(p-l) == l)
            sequential over positions (the true data dependency,
            reference src/decoder.c:34-96), blocks across vector lanes;
            the loop keeps a single u32 pending-start bitmask per lane
            and computes the schedule mask in-kernel from the 6-bit
            length ((1 << len) >> 1, zero for dead positions): every 8
            positions store their started symbols (left-aligned at group
            close), every stripe stores packed per-group counts and a
            running total, so bad masks and the bookkeeping need no
            cumsum or align pass.  One layout serves every NS bucket
            (the round-4 split into packed/non-packed planes is gone).

Final emission = pack_tree merge tree over the group words (capacity
clamped to the output budget); bookkeeping (end bit, corrupt precedence,
short reads) reproduces decoder.c:52-91 exactly as in v2.

Blocks whose trees the table builder rejects (no root, 1-bit codes,
over-capacity state cuts, depth > 25) never reach these kernels — the
driver routes them to the host-exact walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import concat_kernel, pack_tree

TAB_ROWS = 13  # packed: 4 LUT10 + 4 stage1 + 2 tail1(64st) + 3 tails; 2 entries/cell
# Resolve-depth buckets: NS lookup stages beyond LUT10 cover depth
# MAXL_OF_NS[NS]; NS is the static jit key (6 variants).
MAXL_OF_NS = (10, 13, 16, 19, 22, 25)

_DONE = 1 << 15


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------------
# Kernel 1: per-position resolve
# --------------------------------------------------------------------------

# Word rows per tile: 128*128 words = 524288 positions per grid step.
# Wider tiles amortize per-instruction issue overhead (a (16, 128) operand
# is only 2 VPU-cycles of work per op; measured round 4, the 16-row kernel
# ran ~10x below the VPU elementwise roofline purely on issue overhead).
# Out block (1, 16, 128, 128) u32 = 1 MB — well within VMEM double-buffer.
_RW_MAX = 128


def _permute128(row, idx):
    """idx-th entry of a (1, 128) table row, per lane: the hardware lane
    permute (take_along_axis over a broadcast row)."""
    tab = jnp.broadcast_to(row, idx.shape)
    return jnp.take_along_axis(tab, idx, axis=-1)


def _lookup1024p(rows, idx):
    """1024-entry u16 lookup: 4 chunk permutes over packed pair cells.

    Entry i lives in u32 cell i >> 1, halfword i & 1 (native
    build_decode_tables packing) — half the permutes of the round-3
    8-chunk i32 form."""
    ci = idx >> 1
    lo = ci & 127
    hi = ci >> 7
    out = _permute128(rows[0], lo)
    for c in range(1, 4):
        g = _permute128(rows[c], lo)
        out = jnp.where(hi == c, g, out)
    sh = ((idx & 1) << 4).astype(jnp.uint32)
    return (out >> sh) & jnp.uint32(0xFFFF)


def _lookup256p(row, idx):
    """256-entry u16 lookup: one permute over a packed row."""
    g = _permute128(row, idx >> 1)
    sh = ((idx & 1) << 4).astype(jnp.uint32)
    return (g >> sh) & jnp.uint32(0xFFFF)


def _lookup512p(rows, idx):
    """512-entry u16 lookup: two chunk permutes over packed rows."""
    ci = idx >> 1
    lo = ci & 127
    g0 = _permute128(rows[0], lo)
    g1 = _permute128(rows[1], lo)
    g = jnp.where(ci >= 128, g1, g0)
    sh = ((idx & 1) << 4).astype(jnp.uint32)
    return (g >> sh) & jnp.uint32(0xFFFF)


def _resolve_kernel_body(NS: int, RW: int, NARROW: bool):
    def kernel(words_ref, tab_ref, meta_ref):
        lut10 = [tab_ref[0, c:c + 1, :] for c in range(4)]  # (1, 128) rows
        s1 = [tab_ref[0, 4 + c:5 + c, :] for c in range(4)]
        tail1 = [tab_ref[0, 8 + c:9 + c, :] for c in range(2)]
        tail = [tab_ref[0, 10 + k:11 + k, :] for k in range(3)]

        def tile(t, _):
            w = words_ref[0, pl.ds(t * RW, RW), :]
            wx = words_ref[0, pl.ds(t * RW, RW + 1), :]
            rolled = jnp.roll(w, -1, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (RW, 128), 1)
            nxt_col = jnp.broadcast_to(wx[1:, 0:1], (RW, 128))
            wn = jnp.where(lane == 127, nxt_col, rolled)

            def resolve_at(s):
                su = s.astype(jnp.uint32)
                # (wn >> 1) >> (31 - s) instead of wn >> (32 - s): the
                # s == 0 case would shift by 32 (undefined).
                win = (w << su) | ((wn >> 1) >> (jnp.uint32(31) - su))
                # Unary-root fold: a leading 1 bit can never start a code
                # (reference src/tree.c:410-413; the native builder routes
                # crafted non-unary-root trees to the host walk), so only
                # the 512-entry lower LUT10 half is ever live.
                idx10 = ((win >> jnp.uint32(22)) & 511).astype(jnp.int32)
                e = _lookup512p(lut10, idx10)
                e = jnp.where(win >> 31 != 0, jnp.uint32(_DONE), e)
                if NS >= 1 and NARROW:
                    # Narrow stage 1: <= 32 live states at cut 10 (98% of
                    # enwik-like blocks, measured round 5) occupy only the
                    # first 256 stage-1 entries = packed row 4 — ONE chunk
                    # permute instead of four (the 1024-entry stage-1
                    # lookup dominated the cascade wall).
                    idx2 = (((e & 31) << 3)
                            | ((win >> jnp.uint32(19)) & 7)).astype(jnp.int32)
                    e2 = _lookup256p(s1[0], idx2)
                    e = jnp.where(e & _DONE != 0, e, e2)
                elif NS >= 1:
                    # Stage 1: 128 states x 3 bits (cut 10 -> 13).
                    idx2 = (((e & 127) << 3)
                            | ((win >> jnp.uint32(19)) & 7)).astype(jnp.int32)
                    e2 = _lookup1024p(s1, idx2)
                    e = jnp.where(e & _DONE != 0, e, e2)
                for k in range(2, NS + 1):
                    shift = jnp.uint32(16 - 3 * (k - 2))
                    bits3 = (win >> shift) & 7
                    if k == 2:
                        # Tail 1 (cut 13) admits 64 states: 512 entries.
                        idxk = (((e & 63) << 3) | bits3).astype(jnp.int32)
                        ek = _lookup512p(tail1, idxk)
                    else:
                        idxk = (((e & 31) << 3) | bits3).astype(jnp.int32)
                        ek = _lookup256p(tail[k - 3], idxk)
                    e = jnp.where(e & _DONE != 0, e, ek)
                # Terminal entries arrive PRE-TRANSLATED from the native
                # builder: DONE(15) | aux(13:6) | len(5:0), len == 0 =
                # dead/corrupt with aux = fail offset (round-5: the
                # in-kernel translate cost ~6 VPU ops/position).
                return e

            def phase_pair(s2, _):
                lo = resolve_at(2 * s2)
                hi = resolve_at(2 * s2 + 1)
                meta_ref[0, s2, :, :] = lo | (hi << 16)
                return 0

            if NS >= 2 and not NARROW:
                # Unrolled phases schedule ~16% faster for the wide deep
                # cascades (measured round 5: Mosaic pipelines across
                # independent phase pairs only when they share one trace);
                # narrow/shallow cascades run marginally faster rolled.
                for s2 in range(16):
                    phase_pair(jnp.int32(s2), 0)
            else:
                jax.lax.fori_loop(0, 16, phase_pair, 0)
            return 0

        tile(pl.program_id(1), 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def resolve_blocks(words: jax.Array, tables: jax.Array, NS: int,
                   NARROW: bool = False) -> jax.Array:
    """Per-position codeword resolution for a block batch.

    words:  (B, WR + 1, 128) u32 big-endian payload words, the last row
            zero padding (windows read one word ahead).
    tables: (B, TAB_ROWS, 128) u32 packed resolve tables (native build).
    NS:     static lookup-stage count; codes <= MAXL_OF_NS[NS] bits.
    NARROW: every block in the batch has <= 32 live states at cut 10
            (single-permute stage 1; the driver verifies per block).

    Returns meta (B, 16, WR, 128) u32 in pair-plane layout — positions
    p = 32 * w + 2 * s2 and p + 1 of block b live in the low/high halves
    of meta[b, s2, w // 128, w % 128]: each u16 half is the RAW terminal
    table entry, pre-translated by the native builder to
    DONE(15) | aux(13:6) | len(5:0) (len == 0: dead/corrupt, aux = fail
    offset; else aux = decoded symbol).
    """
    B, WRp1, _ = words.shape
    WR = WRp1 - 1
    if WR <= _RW_MAX:
        RW = WR
    elif WR <= 2 * _RW_MAX and (WR // 2) % 8 == 0:
        # Fine P buckets in (64 KiB, 128 KiB]: two tiles of WR // 2 rows
        # (the driver guarantees WR is a multiple of 16 there).
        RW = WR // 2
    else:
        RW = _RW_MAX
    assert WR % RW == 0, WR
    # The word-tile axis is a grid dimension so the per-step output block
    # stays small (a (1, 16, WR, 128) block OOMs VMEM for deep-tree plans
    # with NP = 2^21); the words row is re-fetched per tile step, a ~4x
    # HBM read amplification that is still < 1 ms at bench scale.
    return pl.pallas_call(
        _resolve_kernel_body(NS, RW, NARROW),
        grid=(B, WR // RW),
        in_specs=[
            pl.BlockSpec((1, WRp1, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TAB_ROWS, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, RW, 128), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16, WR, 128), jnp.uint32),
        interpret=_interpret(),
    )(words, tables)


# --------------------------------------------------------------------------
# Kernel 2: chain recurrence + fused group emission
# --------------------------------------------------------------------------

SP = 2048  # positions per grid step (fewer grid steps measured
# marginally faster at bench shapes, round 5; every plan NP is a
# multiple: P buckets are pow2 >= 512 or 4096-multiples)


def _chain_kernel_body(SB: int, sp: int):
    def kernel(meta_ref, start_ref, gw_ref, gc4_ref, gr32_ref, state_ref):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            # pend bit d = a codeword start scheduled d+1 positions ahead;
            # seeding bit 0 realizes is_start(0) = 1 (src/decoder.c:34).
            state_ref[0] = jnp.full((SB, 128), 1, jnp.uint32)
            state_ref[1] = jnp.zeros((SB, 128), jnp.uint32)

        def stripe(j, carry):
            pend, cnt = carry
            word = pend & 0  # u32 zeros with a concrete layout
            gw = pend & 0
            c4 = pend & 0
            cprev = cnt
            for h in range(16):
                m2 = meta_ref[16 * j + h].astype(jnp.uint32)
                for half in range(2):
                    t = 2 * h + half
                    # Composite halfword: DONE | aux(13:6) | len(5:0).
                    if half == 0:
                        sym = (m2 >> 6) & 255
                        ln = m2 & 63
                    else:
                        sym = (m2 >> 22) & 255
                        ln = (m2 >> 16) & 63
                    new = pend & 1
                    started = new == 1
                    word = word | (new << t)
                    # (1 << len) >> 1: the schedule mask, 0 for len == 0
                    # (dead position) without a second select.
                    sched = (jnp.uint32(1) << ln) >> 1
                    gw = jnp.where(started, (gw << 8) | sym, gw)
                    cnt = cnt + new
                    pend = (pend >> 1) | jnp.where(started, sched, 0)
                    if t % 8 == 7:
                        # Left-align at group close ((32 - 8c) & 31; c = 0
                        # leaves gw zero): the emission consumes the plane
                        # directly, with no XLA align pass.
                        gcnt = cnt - cprev
                        gw_ref[4 * j + t // 8] = gw << (
                            (jnp.uint32(32) - (gcnt << 3)) & 31)
                        c4 = c4 | (gcnt << (8 * (t // 8)))
                        cprev = cnt
                        gw = pend & 0
            start_ref[j] = word
            gc4_ref[j] = c4
            gr32_ref[j] = cnt
            return pend, cnt

        pend, cnt = jax.lax.fori_loop(
            0, sp // 32, stripe, (state_ref[0], state_ref[1]))
        state_ref[0] = pend
        state_ref[1] = cnt

    return kernel


@jax.jit
def chain_emit(meta2: jax.Array):
    """is_start bits + per-8-position emission groups for every block.

    meta2: (NP // 2, B) u32 position-major pair plane: positions 2r and
    2r + 1 in the low/high u16 halves of row r, each the pre-translated
    entry aux(13:6) | len(5:0) (len == 0 = dead position; the schedule
    mask is computed in-kernel as (1 << len) >> 1).  Round-5 measurement: the
    kernel is VMEM-load-bound, so the paired plane runs ~1.7x faster
    than the round-4 one-position-per-u32 layout despite ~3 more ALU ops
    per position, and one layout serves every NS bucket.
    Returns
      start (NP // 32, B) u32 — bit t of word w = is_start(32w + t),
      gw    (NP // 8, B) u32  — started symbols of the group in insertion
            order, LEFT-aligned at group close (first started symbol in
            the top byte, bits past 8 * count zero): the emission merge
            tree consumes this plane with no XLA align pass,
      gc4   (NP // 32, B) u32 — PACKED per-group symbol counts, byte k =
            count of group 4j + k.  An axis-0 bitrev of this plane IS the
            merge tree's stride-N/4 packed-lens layout (the low two bits
            of a bit-reversed index land in the top two positions), so no
            unpack/repack pass exists,
      gr32  (NP // 32, B) u32 — running started-symbol total through each
            stripe's last group (the bookkeeping refines within a stripe
            from gc4's four bytes; replaces both the per-group running
            totals and any XLA cumsum).

    Group bad-masks are no longer kernel outputs: started-and-bad =
    start_bits & bad_bits, both available as packed words on the XLA side.

    Sequential over positions within a block (the true dependency of
    reference src/decoder.c:34-96), blocks across vector lanes.  The chain
    state is a single u32 pending-start bitmask per lane (a start of
    length L at p schedules bit L-1 at p+1), so the per-position cost is
    constant — no MAXL-sized lag window.
    """
    NP2, B = meta2.shape
    NP = 2 * NP2
    sp = min(SP, NP)  # tiny batches (unit tests) fit one grid step
    assert NP % sp == 0, (NP, B)
    B_pad = -(-B // 128) * 128
    if B_pad != B:
        meta2 = jnp.pad(meta2, ((0, 0), (0, B_pad - B)))
    SB = B_pad // 128
    grid = NP // sp
    kernel = _chain_kernel_body(SB, sp)
    start, gw, gc4, gr32 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((sp // 2, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sp // 32, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp // 8, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp // 32, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp // 32, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP // 32, SB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((NP // 8, SB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((NP // 32, SB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((NP // 32, SB, 128), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SB, 128), jnp.uint32),
        ],
        interpret=_interpret(),
    )(jax.lax.bitcast_convert_type(meta2, jnp.int32).reshape(NP2, SB, 128))
    return (start.reshape(NP // 32, B_pad)[:, :B],
            gw.reshape(NP // 8, B_pad)[:, :B],
            gc4.reshape(NP // 32, B_pad)[:, :B],
            gr32.reshape(NP // 32, B_pad)[:, :B])


# --------------------------------------------------------------------------
# Emission + bookkeeping (XLA)
# --------------------------------------------------------------------------

def _emit_from_chain(gw_t: jax.Array, gc4m: jax.Array,
                     OUTW: int, ecapw: int | None = None):
    """Concatenate per-group byte strings (VMEM merge-tree kernel).

    gw_t is the chain kernel's (NG, B) group plane, already left-aligned
    in-kernel (no XLA align pass; dead groups' content is zeroed inside
    the merge tree from their zero counts).  gc4m is the (B, NG // 4)
    packed count plane, already live-masked by the caller: byte k of cell
    c = symbols in group 4c + k.  An axis-1 bitrev of gc4m IS the merge
    tree's stride-N/4 packed-lens layout — bitrev maps a cell's low two
    index bits to the top two positions, so cell (c, byte k) lands at
    (brev(c), string + k * N / 4) with zero repacking.  The transpose and
    the gw bitrev stay two separate copies deliberately: a single fused
    (N, B) -> (B, brev N) copy reverses every dimension, which XLA lowers
    ~2x slower than plain .T plus an axis-1 bitrev (measured round 5).
    Falls back to the natural-order XLA merge tree below the kernel's
    minimum string count.

    ``ecapw`` clamps the merge tree's intermediate capacities (words per
    64 groups; None = exact): the driver derives it from each plan's
    symbol densities, and a block whose content exceeds a clamp returns
    ovf=True — the caller re-decodes it on the host-exact path.
    Returns (out_bytes, ovf).
    """
    NG, B = gw_t.shape
    # The merge tree's halving levels need a pow2 string count; fine
    # (non-pow2) plan buckets pad with empty groups, which concatenate as
    # zero-length strings.  The earlier kernel passes (resolve, chain,
    # transpose) already saved the dead-position work.
    NG2 = 1 << max(8, (NG - 1).bit_length())
    if NG2 >= 512 and OUTW % 128 == 0:
        gw = gw_t.T
        gc4p = gc4m
        if NG2 != NG:
            gw = jnp.pad(gw, ((0, 0), (0, NG2 - NG)))
            gc4p = jnp.pad(gc4p, ((0, 0), (0, (NG2 - NG) // 4)))
        gw_b = concat_kernel.bitrev_permute(gw)
        gcp_b = concat_kernel.bitrev_permute(gc4p)
        # bitrev sends group 4c + k to quarter rev2(k) (the reversed LOW
        # two bits become the TOP two), so byte k must serve quarter
        # rev2(k): swap the middle bytes of every cell.
        gcp_b = ((gcp_b & jnp.uint32(0xFF0000FF))
                 | ((gcp_b & jnp.uint32(0xFF00)) << 8)
                 | ((gcp_b >> 8) & jnp.uint32(0xFF00)))
        words, ovf = concat_kernel.concat_groups_ovf(gw_b, gcp_b, OUTW,
                                                     ecapw)
    else:
        # Unpack the per-cell counts to per-group (interleaved order).
        gc = jnp.stack(
            [(gc4m >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
             for k in range(4)], axis=2
        ).reshape(B, -1)[:, :NG].astype(jnp.int32)
        gw = jnp.where(gc > 0, gw_t.T, 0)  # already left-aligned in-kernel
        strings, glens = pack_tree._soa_levels(gw, gc * 8, 3)
        words, _ = pack_tree.concat_bitstrings(strings, glens, max_cap=OUTW)
        if words.shape[1] < OUTW:
            words = jnp.pad(words, ((0, 0), (0, OUTW - words.shape[1])))
        ovf = jnp.zeros(B, bool)
    out = jnp.stack(
        [(words >> 24), (words >> 16), (words >> 8), words], axis=-1
    ).astype(jnp.uint8).reshape(B, 4 * OUTW)
    return out, ovf


def _gather_rows_small(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N) per-block scalar pick via masked reduce.

    One fused full pass per pick; jnp.take_along_axis lowers to a TPU
    gather measured at ~0.07 G/s (bench/probe_primitives.py) whose setup
    dominated the decode bookkeeping phase."""
    iota = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.sum(
        jnp.where(iota == idx[:, None], arr, jnp.zeros_like(arr)), axis=1)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def decode_blocks(words, tables, n_sym, n_cap, NP: int, OUTW: int, NS: int,
                  ECW: int | None = None, NARROW: bool = False):
    """Decode a batch of blocks.

    words:  (B, NP // 4096 + 1, 128) u32 padded big-endian payload words;
    tables: (B, TAB_ROWS, 128) i32 resolve tables; n_sym: (B,) symbols to
    restore; n_cap: (B,) staged payload bytes per block (= live emission
    groups — zero padding beyond it can decode as dense garbage starts
    and is masked out of the emitter).  NP: static bit-position count
    (multiple of 32768); OUTW: static output u32 words per block
    (4*OUTW >= max n_sym); NS: static lookup-stage bucket (codes <=
    MAXL_OF_NS[NS] bits).

    ECW: static emission capacity clamp (words per 64 groups; None =
    exact), derived by the driver from the plan's symbol densities.

    Returns (out, end_bit, corrupt, bad_bit, emit_ovf):
      out (B, 4*OUTW) u8 — decoded bytes, valid through n_sym[b],
      end_bit (B,) i32  — exclusive bit offset after the last symbol
                          (NP when the chain dies early: short read),
      corrupt (B,) bool — chain hit a missing child within n_sym symbols,
      bad_bit (B,) i32  — global bit index of the failing bit,
      emit_ovf (B,) bool — emission clamped out (host re-decode needed).
    """
    B = words.shape[0]
    W = NP // 32
    meta = resolve_blocks(words, tables, NS, NARROW)  # (B,16,WR,128) pairs
    meta = jax.lax.optimization_barrier(meta)
    e2 = meta.reshape(B, 16, W)
    ln_lo = e2 & 63
    ln_hi = (e2 >> 16) & 63
    # badw: bit s of word w = position 32w + s is dead/corrupt (len == 0).
    s2_iota = jax.lax.broadcasted_iota(jnp.uint32, (1, 16, 1), 1)
    badw = jnp.sum(
        jnp.where(ln_lo == 0, jnp.uint32(1) << (2 * s2_iota), jnp.uint32(0))
        | jnp.where(ln_hi == 0, jnp.uint32(1) << (2 * s2_iota + 1),
                    jnp.uint32(0)),
        axis=1)  # (B, W)
    # Position-major pair plane for the chain: row r = positions 2r, 2r+1.
    meta_t = jnp.transpose(e2, (2, 1, 0)).reshape(NP // 2, B)

    start_w, gw_t, gc4_t, gr32_t = chain_emit(meta_t)
    start_w = jax.lax.optimization_barrier(start_w)
    gc4n = gc4_t.T  # (B, NG/4) u32: byte k of cell c = count of group 4c+k
    gr32 = gr32_t.T.astype(jnp.int32)  # (B, NG/4) totals through 4c+3
    # Live-mask the count cells: groups past the staged payload (zero
    # padding can resolve to dense garbage starts) must not emit — their
    # symbols can never be within the first n_sym of a block that
    # completes inside its cap.  Byte-granular: cell c keeps byte k iff
    # 4c + k < n_cap.
    NG4 = gc4n.shape[1]
    ci = jax.lax.broadcasted_iota(jnp.int32, (B, NG4), 1)
    ncap = n_cap.astype(jnp.int32)
    full = ncap[:, None] // 4
    rem = (ncap[:, None] % 4).astype(jnp.uint32)
    keep = jnp.where(
        ci < full, jnp.uint32(0xFFFFFFFF),
        jnp.where(ci == full, (jnp.uint32(1) << (8 * rem)) - 1,
                  jnp.uint32(0)))
    gc4m = gc4n & keep

    # started-and-bad masks from start bits & per-position bad bits.
    sw_bT0 = start_w.T  # (B, W)
    sb_and = sw_bT0 & badw  # (B, W)
    bshifts = (jnp.arange(4, dtype=jnp.uint32) * 8)
    gb = ((sb_and[:, :, None] >> bshifts) & jnp.uint32(0xFF)
          ).reshape(B, 4 * W).astype(jnp.int32)

    out, emit_ovf = _emit_from_chain(gw_t, gc4m, OUTW, ECW)

    # --- bookkeeping (reference decoder.c:52-91 semantics) ---
    # Cell-granular: per-block scalars come from single gathers into the
    # (B, NG/4)/(B, 16*W) planes — no (B, NG) or (B, NP) expansions; the
    # within-cell refinement unpacks four count bytes.
    sw_bT = sw_bT0.astype(jnp.int32)  # (B, W): group g = byte g%4, word g//4
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1)
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
    e2_flat = e2.reshape(B, 16 * W)

    def group_start_mask(g):
        word = _gather_rows_small(sw_bT, g // 4)
        return (word >> ((g % 4) * 8)) & 0xFF

    def composite_at(p):
        # The u16 entry (aux(13:6) | len(5:0)) of position p = 32w + s,
        # gathered from the pair plane: cell (s // 2) * W + w, half s & 1.
        cell = _gather_rows_small(e2_flat, (p % 32) // 2 * W + p // 32)
        return (cell >> (16 * (p & 1).astype(jnp.uint32))) & 0xFFFF

    def cell_counts(cell_idx):
        # (B, 4) per-group counts of count-cell cell_idx.
        v = _gather_rows_small(gc4n, cell_idx)
        return ((v[:, None] >> (8 * iota4).astype(jnp.uint32))
                & 0xFF).astype(jnp.int32)

    def locate(target):
        # First group g with running_total(g) >= target (target >= 1):
        # coarse cell search + 4-byte refinement.  Returns (g, before_g).
        cstar = jnp.argmax(gr32 >= target[:, None], axis=1).astype(jnp.int32)
        before_c = jnp.where(
            cstar > 0,
            _gather_rows_small(gr32, jnp.maximum(cstar - 1, 0)), 0)
        cnts = cell_counts(cstar)
        pref = jnp.cumsum(cnts, axis=1)  # inclusive within-cell prefix
        kk = jnp.argmax(before_c[:, None] + pref >= target[:, None],
                        axis=1).astype(jnp.int32)
        before_g = before_c + jnp.sum(
            jnp.where(iota4 < kk[:, None], cnts, 0), axis=1)
        return cstar * 4 + kk, before_g

    # gr32 comes from the chain kernel (stripe totals) — no XLA cumsum.
    total = gr32[:, -1]
    reached = total >= n_sym
    g_star, before = locate(jnp.maximum(n_sym, 1))
    g_star = jnp.where(reached, g_star, 0)
    k = n_sym - before  # 1-based rank within the group, in [1, 4]
    sg = (group_start_mask(g_star)[:, None] >> iota8) & 1
    csg = jnp.cumsum(sg, axis=1)
    hit = (csg == k[:, None]) & (sg == 1)
    j_star = jnp.argmax(hit, axis=1).astype(jnp.int32)
    p_star = g_star * 8 + j_star
    l_star = (composite_at(p_star) & 63).astype(jnp.int32)
    end_bit = jnp.where(reached, p_star + l_star, NP)

    # corrupt: first bad start (gb marks started-and-bad positions)
    anybad = jnp.any(gb != 0, axis=1)
    gfb = jnp.argmax(gb != 0, axis=1).astype(jnp.int32)
    gbv = _gather_rows_small(gb, gfb)
    bbits = (gbv[:, None] >> iota8) & 1
    jfb = jnp.argmax(bbits, axis=1).astype(jnp.int32)
    fb = gfb * 8 + jfb
    cfb = gfb // 4
    before_cell = jnp.where(
        cfb > 0, _gather_rows_small(gr32, jnp.maximum(cfb - 1, 0)), 0)
    cnts_fb = cell_counts(cfb)
    before_fb = before_cell + jnp.sum(
        jnp.where(iota4 < (gfb % 4)[:, None], cnts_fb, 0), axis=1)
    sgf = (group_start_mask(gfb)[:, None] >> iota8) & 1
    rank_fb = before_fb + jnp.sum(
        jnp.where(iota8 <= jfb[:, None], sgf, 0), axis=1
    )
    corrupt = anybad & (rank_fb <= n_sym)
    # aux field of a dead position = the fail offset within the codeword.
    fail_off = ((composite_at(fb) >> 6) & 255).astype(jnp.int32)
    bad_bit = fb + fail_off
    return out, end_bit, corrupt, bad_bit, emit_ovf


@functools.partial(jax.jit, static_argnums=(1,))
def decode_blocks_many(arrays, shapes):
    """All device plans of a stream in ONE dispatch.

    Dispatch latency on this platform is a flat ~23.5 ms that does not
    pipeline (bench/probe_r4_dispatch.py) — per-plan dispatches made the
    round-3 decode pay ~140 ms of pure latency per 100 MB.  XLA's buffer
    allocator frees each plan's intermediates before the next plan's run,
    so peak HBM stays at one plan's working set plus inputs/outputs.

    arrays: tuple of (words, tables, n_sym, n_cap) quadruples; shapes:
    matching tuple of static (NP, OUTW, NS, ECW, NARROW).  Returns the
    per-plan decode_blocks results.
    """
    return tuple(
        decode_blocks(w, t, n, nc, *shp)
        for (w, t, n, nc), shp in zip(arrays, shapes)
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def decode_blocks_prefix_many(arrays, shapes, upto: int):
    """Fused-single-dispatch variant of the profiling ablation: every plan's
    pipeline truncated after stage ``upto``, one dispatch, one checksum —
    the only way to get clean absolute phase walls when device time can
    exceed the non-pipelining ~23.5 ms dispatch RTT (PERF.md §1)."""
    acc = jnp.uint32(0)
    for (w, t, n, nc), shp in zip(arrays, shapes):
        NP, OUTW, NS = shp[:3]
        NARROW = shp[4] if len(shp) > 4 else False
        acc = acc + decode_blocks_prefix(
            w, t, n, nc, NP, OUTW, NS, upto, NARROW).astype(jnp.uint32)
    return acc


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def decode_blocks_prefix(words, tables, n_sym, n_cap, NP: int, OUTW: int,
                         NS: int, upto: int, NARROW: bool = False):
    """Profiling ablation: the decode pipeline truncated after stage ``upto``
    (1=resolve, 2=+chain/emit-groups, 3=+emission tree, 4=full incl.
    bookkeeping), reduced to a checksum.  BENCH_PHASES=1 drives this."""
    u32 = jnp.uint32
    B = words.shape[0]
    meta = jax.lax.optimization_barrier(
        resolve_blocks(words, tables, NS, NARROW))
    if upto == 1:
        return jnp.sum(meta)
    e2 = meta.reshape(B, 16, NP // 32)
    meta_t = jnp.transpose(e2, (2, 1, 0)).reshape(NP // 2, B)
    start_w, gw_t, gc4_t, gr32_t = chain_emit(meta_t)
    if upto == 2:
        return (jnp.sum(start_w) + jnp.sum(gw_t) + jnp.sum(gc4_t)
                + jnp.sum(gr32_t))
    gc4n = gc4_t.T
    NG4 = gc4n.shape[1]
    ci = jax.lax.broadcasted_iota(jnp.int32, gc4n.shape, 1)
    ncap = n_cap.astype(jnp.int32)
    rem = (ncap[:, None] % 4).astype(u32)
    keep = jnp.where(
        ci < ncap[:, None] // 4, u32(0xFFFFFFFF),
        jnp.where(ci == ncap[:, None] // 4, (u32(1) << (8 * rem)) - 1,
                  u32(0)))
    out, _ovf = _emit_from_chain(gw_t, gc4n & keep, OUTW)
    if upto == 3:
        return jnp.sum(out.astype(u32))
    res = decode_blocks(words, tables, n_sym, n_cap, NP, OUTW, NS, None,
                        NARROW)
    out, end_bit, corrupt, bad_bit, _eovf = res
    return (jnp.sum(out.astype(u32)) + jnp.sum(end_bit.astype(u32))
            + jnp.sum(corrupt.astype(u32)) + jnp.sum(bad_bit.astype(u32)))
