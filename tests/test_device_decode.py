"""Parallel device decode vs host codec, oracle streams, and error taxonomy."""

import numpy as np
import pytest

from libhuffman_tpu import decode as dec_mod
from libhuffman_tpu import encode as enc_mod
from libhuffman_tpu.errors import (
    BtreeCorruptedError,
    BtreeOverflowError,
    HuffmanError,
    ReadWriteError,
)
from libhuffman_tpu.ops import hostref
from oracle import ref_compress


def _roundtrip(data: bytes, bs: int):
    enc = ref_compress(data, bs if bs else len(data))
    got = dec_mod.decode(enc)
    assert got == data


def test_decode_golden_small():
    _roundtrip(b"0123456789", 65536)
    _roundtrip(b"1", 256)
    _roundtrip(b"aab", 65536)
    _roundtrip(b"aabba", 2)


def test_decode_multiblock_text():
    data = (b"The quick brown fox jumps over the lazy dog. " * 2000)[:65536]
    _roundtrip(data, 1024)
    _roundtrip(data, 4096)


def test_decode_single_symbol_run():
    # All-"a" blocks: 1-bit codes, the densest pointer-jump chains.
    _roundtrip(b"a" * 10000, 1024)


def test_decode_zero_run_candidate_explosion():
    # b"\x00" * N payloads are all-zero bytes: would flood the speculative
    # candidate scan if n_sym=0 offsets weren't filtered; either way the
    # chain must resolve (sequential fallback allowed).
    _roundtrip(b"\x00" * 30000, 4096)


@pytest.mark.parametrize("seed", range(5))
def test_decode_random_vs_oracle(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1, 30000))
    data = rng.integers(0, 256 if seed % 2 else 4, n, dtype=np.uint8).tobytes()
    bs = int(rng.choice([0, 100, 1024, 65536]))
    _roundtrip(data, bs)


def test_decode_long_same_size_run_chunking():
    # >128 same-P-bucket candidates: the plan splitter's 128-multiple
    # rounding must never reach past the run into larger-cap candidates
    # (round-5 regression: csize rounded beyond the run tripped the
    # cap <= P invariant).
    data = (b"The quick brown fox jumps over the lazy dog. " * 8000)[:200 << 10]
    _roundtrip(data, 1024)


def test_decode_own_encode():
    data = open("/root/reference/README.md", "rb").read()
    enc = enc_mod.encode(data, 2048)
    assert dec_mod.decode(enc) == data


def test_decode_errors():
    assert dec_mod.decode(b"") == b""
    with pytest.raises(BtreeOverflowError):
        dec_mod.decode(b"\xde\xad\xbe\xef\x00\x00\x00\x00\xff\x7f" + b"\x00" * 16)
    good = ref_compress(b"0123456789", 65536)
    with pytest.raises(ReadWriteError):
        dec_mod.decode(good[:20])
    bad = bytearray(good)
    bad[8:10] = (3).to_bytes(2, "little")
    with pytest.raises((BtreeCorruptedError, ReadWriteError)):
        dec_mod.decode(bytes(bad))
    # Truncated payload: all-"a" stream cut mid-payload.
    enc = ref_compress(b"a" * 10000, 0)
    with pytest.raises(ReadWriteError):
        dec_mod.decode(enc[:-1])
    # Trailing garbage after a valid block.
    with pytest.raises(HuffmanError):
        dec_mod.decode(good + b"\x01\x02\x03")


def test_decode_matches_reference_on_trailing_block():
    # A second valid block appended: both must decode.
    e1 = ref_compress(b"hello world", 0)
    e2 = ref_compress(b"goodbye", 0)
    assert dec_mod.decode(e1 + e2) == b"hello worldgoodbye"


# --- round-4/5 decode safety valves ---------------------------------------

def _dense_run_block() -> bytes:
    """A block whose MEAN symbol density fits the ECW clamp but whose run
    region locally exceeds it: ~28 KB of near-uniform bytes (deep codes,
    sparse emission) followed by two 18 KB two-symbol runs (2-bit codes,
    ~4 symbols per payload byte)."""
    rng = np.random.default_rng(77)
    head = rng.integers(0, 256, 28 << 10, dtype=np.uint8).tobytes()
    return head + b"a" * (18 << 10) + b"b" * (18 << 10)


def test_emit_capacity_overflow_falls_back_exactly():
    """ECW underestimates the run region -> emit_ovf -> host re-decode
    stays wire exact (decode.py _apply_plan_results first branch)."""
    import jax.numpy as jnp
    from libhuffman_tpu import decode as dec_mod
    from libhuffman_tpu import native
    from libhuffman_tpu.ops import decode_v3 as ddec

    if not native.available():
        pytest.skip("needs the native table builder")
    data = _dense_run_block()
    enc = enc_mod.encode(data, 0)  # one 64 KB block
    plans, _ = dec_mod.build_device_plans(enc)
    assert len(plans) == 1 and plans[0].ecw is not None, (
        "construction must produce a clamped single-block plan")
    p = plans[0]
    res = ddec.decode_blocks(
        jnp.asarray(p.words), jnp.asarray(p.tables), jnp.asarray(p.n_sym),
        jnp.asarray(p.caps), p.NP, p.OUTW, p.ns, p.ecw)
    eovf = np.asarray(res[4])
    assert eovf[0], "the run region must overflow the density-derived ECW"
    # Driver-level: the emit_ovf block re-decodes exactly on the host.
    assert dec_mod.decode(enc) == data


def test_tightened_cap_short_read_retries_on_host(monkeypatch):
    """A speculative cap tightened below the true payload (the
    false-positive-candidate-inside-payload scenario) must route the block
    back to the host-exact walk, not raise or corrupt
    (decode.py _apply_plan_results cap < avail branches)."""
    from libhuffman_tpu import decode as dec_mod
    from libhuffman_tpu import native

    data = (b"The retry path must stay byte-exact under short caps. " * 3000
            )[:96 << 10]
    enc = enc_mod.encode(data, 4096)
    orig = dec_mod._payload_cap
    monkeypatch.setattr(
        dec_mod, "_payload_cap",
        lambda c, depth, nxt: max(96, orig(c, depth, nxt) // 3))
    fallbacks = []
    if native.available():
        orig_scan = native.scan_stream

        def spy(*a, **kw):
            fallbacks.append(1)
            return orig_scan(*a, **kw)

        monkeypatch.setattr(native, "scan_stream", spy)
    assert dec_mod.decode(enc) == data
    if native.available():
        assert fallbacks, "short caps must exercise the host retry path"


def test_threaded_header_scan_matches_reference_scanner():
    """The segmented (threaded) native header scan only engages above
    8 MB; its overlap/half-open-range splitting must reproduce the pure
    python scanner exactly, including candidates straddling segment
    boundaries."""
    from libhuffman_tpu import native
    from libhuffman_tpu.format import find_candidate_headers

    if not native.available():
        pytest.skip("needs the native library")
    rng = np.random.default_rng(123)
    # Dense candidate bait: periodic zero quads + plausible tree lengths.
    buf = rng.integers(0, 256, 9 << 20, dtype=np.uint8)
    buf[::97] = 0
    buf[1::97] = 0
    buf[2::97] = 0
    buf[3::97] = 0
    got = native.find_headers(buf)
    ref = find_candidate_headers(buf)
    assert np.array_equal(got, ref)


def test_non_unary_root_tree_matches_reference():
    """Crafted streams may serialize a tree whose root has a REAL right
    child (our encoder never emits one — src/tree.c:410-413 always wraps);
    the native table builder routes those to the host-exact walk, which
    must decode byte-identically to the reference."""
    from oracle import ref_decompress

    import struct

    tree = [256, ord("a"), -1, -1, ord("b"), -1, -1]  # a="0", b="1"
    payload = bytes([0b01100000])  # a b b a + pad
    stream = (struct.pack("<Q", 4) + struct.pack("<h", len(tree))
              + b"".join(struct.pack("<h", v) for v in tree) + payload)
    assert ref_decompress(stream) == b"abba", "oracle premise"
    assert dec_mod.decode(stream) == b"abba"
    # And the builder really does reject it from the device path.
    from libhuffman_tpu import native

    if native.available():
        buf = np.array(tree, np.int16)
        _t, ns, _mi, _ma = native.build_decode_tables(
            buf, np.array([0], np.int64), np.array([len(tree)], np.int32))
        assert int(ns[0]) < 0


def test_resolve_narrow_matches_wide():
    """For a narrow-eligible batch the NARROW=True cascade must produce
    the identical meta plane as the wide one (same tables, fewer
    permutes)."""
    import jax.numpy as jnp
    from libhuffman_tpu import decode as dec_mod2
    from libhuffman_tpu import native
    from libhuffman_tpu.ops import decode_v3 as ddec

    if not native.available():
        pytest.skip("needs the native table builder")
    # Fibonacci-ish frequencies: depth > 10 (multi-stage) but few states.
    vals = []
    a, b = 1, 1
    for s2 in range(18):
        vals += [s2] * a
        a, b = b, a + b
    blk = hostref.encode_block(np.array(vals, np.uint8))
    import libhuffman_tpu.format as fmt

    hdr = fmt.parse_block_header(memoryview(blk), 0)
    tree = np.asarray(hdr.tree, np.int16)
    tables, ns, _mi, _ma = native.build_decode_tables(
        tree, np.array([0], np.int64), np.array([len(tree)], np.int32))
    assert int(ns[0]) >= 1
    assert bool(dec_mod2._narrow_flags(tables)[0]), "construction premise"
    rng = np.random.default_rng(3)
    words = jnp.asarray(rng.integers(0, 1 << 32, (1, 5, 128),
                                     dtype=np.uint64).astype(np.uint32))
    tabs = jnp.asarray(tables)
    m_wide = np.asarray(ddec.resolve_blocks(words, tabs, int(ns[0]), False))
    m_narrow = np.asarray(ddec.resolve_blocks(words, tabs, int(ns[0]), True))
    assert np.array_equal(m_wide, m_narrow)


# --- decode_v3 kernel internals -------------------------------------------

@pytest.mark.parametrize("maxl", [10, 25])
def test_chain_emit_matches_numpy_reference(maxl):
    """The Pallas is_start recurrence + fused group emission against a
    direct sequential walk (shallow and deepest code lengths)."""
    import jax.numpy as jnp
    from libhuffman_tpu.ops import decode_v3 as ddec

    rng = np.random.default_rng(7)
    NP, B = 1024, 3
    lens = rng.integers(2, maxl + 1, (B, NP)).astype(np.uint8)
    lens[0, 5] = 0  # a dead position: the chain must stop if it lands here
    syms = rng.integers(0, 256, (B, NP)).astype(np.uint8)
    # Pair-plane entries: aux(13:6) | len(5:0), two positions per u32.
    m16 = (syms.astype(np.uint32) << 6) | lens.astype(np.uint32)
    meta2 = m16[:, 0::2] | (m16[:, 1::2] << 16)  # (B, NP // 2)

    start_w, gw, gc4, gr32 = ddec.chain_emit(jnp.asarray(meta2.T))
    start_w = np.asarray(start_w)
    gw = np.asarray(gw).T       # (B, NG) left-aligned group strings
    gc4 = np.asarray(gc4).T     # (B, NG/4) packed per-group counts
    gr32 = np.asarray(gr32).T   # (B, NG/4) totals through group 4c+3
    got = np.zeros((B, NP), bool)
    for wi in range(NP // 32):
        for t in range(32):
            got[:, 32 * wi + t] = (start_w[wi] >> t) & 1

    for b in range(B):
        expect = np.zeros(NP, bool)
        p = 0
        while p < NP:
            expect[p] = True
            if lens[b, p] == 0:
                break
            p += int(lens[b, p])
        assert np.array_equal(got[b], expect), b
        running = 0
        for g in range(NP // 8):
            members = [p for p in range(8 * g, 8 * g + 8) if expect[p]]
            running += len(members)
            cnt = (int(gc4[b, g // 4]) >> (8 * (g % 4))) & 0xFF
            assert cnt == len(members), (b, g)
            if g % 4 == 3:
                assert gr32[b, g // 4] == running, (b, g)
            w = 0
            for p in members:
                w = ((w << 8) | int(syms[b, p])) & 0xFFFFFFFF
            w = (w << ((32 - 8 * len(members)) & 31)) & 0xFFFFFFFF
            assert gw[b, g] == w, (b, g)  # kernel left-aligns at close


def test_resolve_blocks_matches_table_walk():
    """The Pallas resolve cascade against a direct host table walk."""
    import jax.numpy as jnp
    from libhuffman_tpu import format as fmt
    from libhuffman_tpu import native
    from libhuffman_tpu.ops import decode_v3 as ddec

    if not native.available():
        pytest.skip("needs the native table builder")
    rng = np.random.default_rng(9)
    # A deep-ish tree: fibonacci-like frequencies force multi-stage codes.
    vals = []
    a, b = 1, 1
    for s in range(18):
        vals += [s] * a
        a, b = b, a + b
    data = np.array(vals, np.uint8)
    blk = hostref.encode_block(data)
    hdr = __import__("libhuffman_tpu").format.parse_block_header(
        memoryview(blk), 0)
    tree = np.asarray(hdr.tree, np.int16)
    tables, ns, mind, maxd = native.build_decode_tables(
        tree, np.array([0], np.int64), np.array([len(tree)], np.int32))
    NS = int(ns[0])
    assert NS >= 1  # multi-stage by construction

    W = 128
    payload = rng.integers(0, 1 << 32, W + 128, dtype=np.uint64
                           ).astype(np.uint32)
    words = payload.reshape(1, -1, 128)
    meta = np.asarray(ddec.resolve_blocks(
        jnp.asarray(words), jnp.asarray(tables), NS))
    T = tables[0].reshape(-1)

    def ent(i, base_cells):
        cell = int(T[base_cells + (i >> 1)])
        return (cell >> (16 * (i & 1))) & 0xFFFF

    def table_resolve(w32):
        # Packed layout: LUT10 cells [0,512), stage1 [512,1024), tail 1
        # (64 states) [1024,1280), tails 2-4 at [1280 + 128k, ...)
        # (native build_decode_tables).
        e = ent((w32 >> 22) & 1023, 0)
        k = 1
        while not (e & (1 << 15)):
            if k == 1:
                e = ent(((e & 127) << 3) | ((w32 >> 19) & 7), 512)
            elif k == 2:
                e = ent(((e & 63) << 3) | ((w32 >> 16) & 7), 1024)
            else:
                bits3 = (w32 >> (16 - 3 * (k - 2))) & 7
                e = ent(((e & 31) << 3) | bits3, 1280 + 128 * (k - 3))
            k += 1
        return e

    flat = payload[:W]
    for p in rng.integers(0, 32 * W - 32, 200):
        p = int(p)
        j, s = p // 32, p % 32
        w32 = int(flat[j]) << s & 0xFFFFFFFF
        if s:
            w32 |= int(payload[j + 1]) >> (32 - s)
        e = table_resolve(w32)
        # Terminal entries are pre-translated by the native builder
        # (DONE | aux(13:6) | len(5:0)); the kernel stores raw pairs for
        # positions (2*s2, 2*s2 + 1) in one u32 cell.
        m = (int(meta[0, s // 2, j // 128, j % 128]) >> (16 * (s & 1))) \
            & 0xFFFF
        assert m == e, p
