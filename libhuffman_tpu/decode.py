"""Whole-stream decode: speculative parallel block discovery + device kernels.

Block boundaries in the libhuffman format are only discoverable by decoding
(the payload length is implicit, SURVEY.md §2.9), which would make the stream
a sequential chain.  This decoder breaks the chain speculatively:

  1. One vectorized pass finds every *candidate* header (u64 length with zero
     high bytes, tree_length in range — true block starts always match,
     false positives are rare and merely waste speculative work).
  2. All candidates are decoded in parallel on the device
     (ops/decode_v2.py), each yielding its symbols, its consumed payload
     size, and error flags.
  3. The true chain is resolved on the host by following consumed sizes from
     offset 0; any gap (missed candidate, flagged block, adversarial stream)
     falls back to the host-exact sequential decoder for that block, so
     correctness never depends on the speculation.

Error semantics mirror src/decoder.c:201-287: the first failing block in
*chain order* raises; garbage beyond the consumed span of a valid stream
suffix still raises ReadWrite/BtreeOverflow exactly like the reference's
outer loop.
"""

from __future__ import annotations

import numpy as np

from .errors import BtreeCorruptedError, ReadWriteError
from .format import (
    BLOCK_HEADER,
    deserialize_tree,
    find_candidate_headers,
    parse_block_header,
)
from . import native
from .ops import hostref
from .ops import decode_v2 as ddec
from .utils.trace import annotate

# Device batch sizing: total bit positions per dispatch (~16 MiB payload).
_POSITION_BUDGET = 1 << 27
_NT = 1027  # tree node slots: up to 1025 preorder nodes + root pad + trap
# Static max-code-length buckets (jit cache keys); > 32 falls back to host.
_MAXL_BUCKETS = (12, 16, 20, 26, 32)

# Distinct device-kernel shapes dispatched so far: (B, NP, OUTW, MAXL).
# The bucket scheme bounds the product — B and OUTW are pow2-bucketed, NP
# is pow2 in [512, 2^21], MAXL one of five values — and the bench reports
# len(compile_keys()) so jit-cache pressure is measured, not guessed.
_COMPILE_KEYS: set[tuple[int, int, int, int]] = set()


def compile_keys() -> frozenset:
    """Distinct decode-kernel jit keys dispatched in this process."""
    return frozenset(_COMPILE_KEYS)


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


_PAD_TREE_CACHE = None


def _pad_tree() -> np.ndarray:
    """(NT_PAD,) packed node row for padding blocks: every step traps, so
    the LUT marks all windows corrupt and min code length stays 64 (no
    spurious dense_ovf flags from padding lanes)."""
    global _PAD_TREE_CACHE
    if _PAD_TREE_CACHE is None:
        trap = _NT - 1
        _PAD_TREE_CACHE = np.full(
            ddec.NT_PAD,
            np.uint32(trap) | (np.uint32(trap) << 11) | (np.uint32(257) << 22),
            np.uint32,
        )
    return _PAD_TREE_CACHE


class _Candidate:
    __slots__ = (
        "off", "n_sym", "tree", "payload_off", "avail",
        "fallback", "error", "result",
    )

    def __init__(self, off, n_sym, tree, payload_off, avail):
        self.off = off
        self.n_sym = n_sym
        self.tree = tree
        self.payload_off = payload_off
        self.avail = avail  # payload bytes available before stream end
        self.fallback = False  # decode on host when reached
        self.error = None  # exception class to raise when reached
        self.result = None  # (symbols bytes, consumed payload bytes)


def _tree_arrays(tree_i16: np.ndarray):
    """Deserialize + flatten to the packed (NT,) uint32 node table
    (left(11) | right(11) | symcode(9); symcode 0..255 = leaf symbol,
    256 = internal, 257 = trap); returns None for an empty tree, else
    (packed, depth)."""
    left, right, index, root = deserialize_tree(tree_i16)
    n = len(left)
    if root < 0:
        return None
    trap = _NT - 1
    L = np.full(_NT, trap, np.uint32)
    R = np.full(_NT, trap, np.uint32)
    SC = np.full(_NT, 257, np.uint32)  # trap marker everywhere unused
    L[:n] = np.where(left >= 0, left, trap).astype(np.uint32)
    R[:n] = np.where(right >= 0, right, trap).astype(np.uint32)
    is_leaf = (left < 0) & (right < 0)
    SC[:n] = np.where(is_leaf, index & 0xFF, 256).astype(np.uint32)
    packed = L | (R << 11) | (SC << 22)
    # Depth via iterative preorder over child pointers.
    depth = 0
    stack = [(root, 0)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if left[node] >= 0:
            stack.append((int(left[node]), d + 1))
        if right[node] >= 0:
            stack.append((int(right[node]), d + 1))
    return packed, depth


def _decode_candidates_device(data: np.ndarray, cands: list[_Candidate]):
    """Speculatively decode eligible candidates in batches on the device."""
    import jax.numpy as jnp

    # Pre-filter, then deserialize all candidate trees in one native batch
    # call (python recursion per block is the host bottleneck otherwise).
    pending = []
    for c in cands:
        if c.n_sym == 0:
            c.result = (b"", 0)
            continue
        if c.n_sym > 8 * c.avail:
            # Each symbol consumes >= 1 bit: guaranteed short read if this
            # block is ever reached (decoder.c:52-56 path).
            c.error = ReadWriteError
            continue
        pending.append(c)

    packed_all = depths_all = counts_all = None
    if pending and native.available():
        bufs = np.concatenate([np.asarray(c.tree, np.int16) for c in pending])
        lens = np.array([len(c.tree) for c in pending], np.int32)
        offs = np.concatenate(([0], np.cumsum(lens[:-1], dtype=np.int64)))
        packed_all, counts_all, depths_all = native.deserialize_trees(
            bufs, offs, lens
        )

    eligible = []
    for i, c in enumerate(pending):
        if packed_all is not None:
            if counts_all[i] < 0:
                # NULL root with symbols to restore: reference NULL-derefs;
                # we raise BTREE_CORRUPTED (SURVEY.md §7 item 8).
                c.error = BtreeCorruptedError
                continue
            packed, depth = packed_all[i], int(depths_all[i])
        else:
            t = _tree_arrays(c.tree)
            if t is None:
                c.error = BtreeCorruptedError
                continue
            packed, depth = t
        if depth > ddec.MAX_WALK or depth < 2:
            # Deeper than the device ceiling, or a tree admitting 1-bit
            # codes (single-symbol / crafted): host-exact path.
            c.fallback = True
            continue
        # Sound payload upper bound: every code is <= depth bits, so this
        # block consumes at most ceil(n_sym*depth/8) payload bytes.  Sizing
        # buffers by this (not by the remaining stream) keeps batches
        # shape-homogeneous and avoids decoding into other blocks' bytes.
        cap = min(c.avail, (c.n_sym * depth + 7) // 8)
        if cap > (1 << 18):
            # Oversized single blocks can't amortize the 128-lane batch
            # minimum of the chain kernel: host/native path.
            c.fallback = True
            continue
        eligible.append((c, packed, cap, depth))

    for plan in _build_plans(data, eligible):
        with annotate("huff.decode.device"):
            out, end_bit, corrupt, bad_bit, flags = _run_plan(plan)
            out_h = np.asarray(out)
        _apply_plan_results(
            plan, out_h, np.asarray(end_bit), np.asarray(corrupt),
            np.asarray(bad_bit), np.asarray(flags[0]), np.asarray(flags[1]),
        )


class _Plan:
    __slots__ = ("w32", "trees", "n_sym", "NP", "OUTW", "maxl", "batch")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _build_plans(data: np.ndarray, eligible) -> list[_Plan]:
    """Shape-homogeneous device batches from eligible candidates."""
    eligible = sorted(eligible, key=lambda e: e[2])
    plans = []
    i = 0
    while i < len(eligible):
        # Greedy batch under the position budget.
        P = _bucket(eligible[i][2] + 8, 64)  # +8: off-the-end slack
        NP = 8 * P
        B = max(1, _POSITION_BUDGET // NP)
        batch = eligible[i : i + B]
        while _bucket(batch[-1][2] + 8, 64) != P and len(batch) > 1:
            batch.pop()
        i += len(batch)
        B = _bucket(len(batch), 16)
        W = NP // 32
        words = np.zeros((B, W * 4), np.uint8)
        trees = np.tile(_pad_tree(), (B, 1))
        n_sym = np.ones(B, np.int32)
        max_sym = 1
        maxl = _MAXL_BUCKETS[0]
        for b, (c, packed, cap, depth) in enumerate(batch):
            seg = data[c.payload_off : c.payload_off + min(cap, P)]
            words[b, : len(seg)] = seg
            trees[b, :_NT] = packed
            n_sym[b] = c.n_sym
            max_sym = max(max_sym, c.n_sym)
            maxl = max(maxl, depth)
        for m in _MAXL_BUCKETS:
            if maxl <= m:
                maxl = m
                break
        wview = words.reshape(B, W, 4).astype(np.uint32)
        w32 = (
            (wview[:, :, 0] << 24) | (wview[:, :, 1] << 16)
            | (wview[:, :, 2] << 8) | wview[:, :, 3]
        )
        OUTW = _bucket(max_sym, 512) // 4
        plans.append(_Plan(w32=w32, trees=trees, n_sym=n_sym, NP=NP,
                           OUTW=OUTW, maxl=maxl, batch=batch))
    return plans


def _run_plan(plan: _Plan):
    import jax.numpy as jnp

    _COMPILE_KEYS.add((plan.w32.shape[0], plan.NP, plan.OUTW, plan.maxl))
    return ddec.decode_blocks(
        jnp.asarray(plan.w32), jnp.asarray(plan.trees),
        jnp.asarray(plan.n_sym), plan.NP, plan.OUTW, plan.maxl,
    )


def _apply_plan_results(plan, out_h, end_h, cor_h, bad_h, esc_ovf, dense_ovf):
    if bool(esc_ovf):
        # Escape-compaction overflow (adversarial windows): host path.
        for c, *_ in plan.batch:
            c.fallback = True
        return
    for b, (c, *_rest) in enumerate(plan.batch):
        if dense_ovf[b]:
            c.fallback = True  # 1-bit codes slipped past depth check
            continue
        if cor_h[b]:
            # Read-then-step precedence (decoder.c:52-71): a failing bit
            # beyond the available payload is a short read, not
            # corruption of a byte that was never read.
            if int(bad_h[b]) // 8 < c.avail:
                c.error = BtreeCorruptedError
            else:
                c.error = ReadWriteError
            continue
        consumed = (int(end_h[b]) + 7) // 8
        if consumed > c.avail:
            c.error = ReadWriteError
            continue
        c.result = (out_h[b, : c.n_sym].tobytes(), consumed)


def _chain(data: bytes, length: int, use_device: bool):
    """Resolve the block chain from offset 0.

    Yields per-block decoded bytes; raises on the first failing block in
    chain order.  ReadWriteError carries ``consumed`` (the offset of the
    block whose data is incomplete) so incremental callers can buffer.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    cand_map: dict[int, _Candidate] = {}
    if use_device and length > 0:
        with annotate("huff.decode.scan"):
            offs = find_candidate_headers(buf[:length])
        # Pathological candidate explosion (crafted input): stay sequential.
        if len(offs) <= max(64, length // 64):
            mv = memoryview(data)
            cands = []
            for off in offs.tolist():
                try:
                    hdr = parse_block_header(mv, off)
                except Exception:
                    continue
                avail = length - hdr.payload_off
                if avail < 0:
                    continue
                c = _Candidate(off, hdr.n_sym, np.asarray(hdr.tree), hdr.payload_off, avail)
                cands.append(c)
                cand_map[off] = c
            _decode_candidates_device(buf, cands)

    out = []
    mv = memoryview(data)
    off = 0
    while off < length:
        try:
            c = cand_map.get(off)
            if c is not None and c.error is not None:
                raise c.error("Failed to decode the data")
            if c is not None and c.result is not None:
                syms, consumed = c.result
                out.append(syms)
                off = c.payload_off + consumed
                continue
            # Host-exact fallback (missed candidates, deep trees, explosions).
            hdr = parse_block_header(mv, off)
            if hdr.n_sym > 8 * max(length - hdr.payload_off, 0):
                # Each symbol consumes >= 1 bit: guaranteed short read.  Also
                # guards output allocation against adversarial u64 lengths.
                raise ReadWriteError("Failed to decode the data")
            if native.available():
                err, consumed_b, produced, _blocks, o = native.scan_stream(
                    buf[off:length], decode=True, out_cap=hdr.n_sym,
                    max_blocks=1,
                )
                if err == 3:
                    raise ReadWriteError("Failed to decode the data")
                if err == 5:
                    from .errors import BtreeOverflowError

                    raise BtreeOverflowError("Failed to decode the data")
                if err == 6:
                    raise BtreeCorruptedError("Failed to decode the data")
                out.append(o[:produced].tobytes())
                off = off + consumed_b
            else:
                syms, consumed = hostref.decode_block_payload(
                    hdr.tree, buf[hdr.payload_off : length], hdr.n_sym
                )
                out.append(syms.tobytes())
                off = hdr.payload_off + consumed
        except ReadWriteError as e:
            # Incomplete data at the chain tail: everything decoded so far
            # is valid and ``off`` marks the incomplete block's start.
            e.partial = (b"".join(out), off)
            raise
    return b"".join(out), off


def decode(data: bytes, length: int | None = None, use_device: bool = True,
           config=None) -> bytes:
    """Whole-stream decode with the reference's strict semantics: the first
    failing block in chain order raises (src/decoder.c:218-275).

    A :class:`~libhuffman_tpu.config.DecodeConfig` overrides the positional
    knobs (config.length caps consumption; use_device routes eligibility)."""
    if config is not None:
        use_device = config.use_device
        if config.length:
            length = config.length
    if length is None:
        length = len(data)
    if length == 0:
        return b""
    out, _ = _chain(data, length, use_device)
    return out


def decode_prefix(data: bytes, length: int | None = None,
                  use_device: bool = True) -> tuple[bytes, int]:
    """Decode every *complete* block; returns (output, consumed offset).

    A trailing incomplete block (short header, tree, or payload) stops the
    chain cleanly instead of raising — the incremental decompressor buffers
    from ``consumed`` onward.  Corruption errors still raise.
    """
    if length is None:
        length = len(data)
    if length == 0:
        return b"", 0
    try:
        return _chain(data, length, use_device)
    except ReadWriteError as e:
        return getattr(e, "partial", (b"", 0))
