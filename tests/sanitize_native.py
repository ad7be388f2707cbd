"""ASAN/UBSAN harness for the native host runtime (native/huffman_native.cpp).

The reference runs valgrind over every C test (test/CMakeLists.txt:8-26);
this is the equivalent for the framework's own C++: build the library with
-fsanitize=address,undefined and push adversarial + well-formed streams
through every entry point.  Run via CI (.github/workflows/ci.yaml job
``native-sanitizers``) or locally:

    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
    LIBHUFFMAN_TPU_NATIVE_FLAGS="-fsanitize=address,undefined -g -O1" \
    LIBHUFFMAN_TPU_NATIVE_DIR=$(mktemp -d) \
    python tests/sanitize_native.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from libhuffman_tpu import native  # noqa: E402
from libhuffman_tpu.ops import hostref  # noqa: E402


def main():
    assert native.available(), "native toolchain missing"
    rng = np.random.default_rng(0)

    # 1. Round-trip scan/decode over well-formed streams of many shapes.
    for n, bs in ((1, 256), (10, 65536), (300, 7), (5000, 512),
                  (20000, 4096), (65536, 65536)):
        data = rng.integers(0, 256 if n % 2 else 3, n, np.uint8).tobytes()
        enc = hostref.encode(data, bs)
        buf = np.frombuffer(enc, np.uint8)
        err, consumed, produced, blocks, out = native.scan_stream(
            buf, decode=True, out_cap=n)
        assert err == 0 and produced == n and out[:n].tobytes() == data, (
            n, bs, err, produced)

    # 2. Batch tree (de)serialization, including the 1025-entry worst case.
    data = bytes(range(256)) * 8
    enc = hostref.encode(data, 2048)
    from libhuffman_tpu.format import parse_block_header
    mv = memoryview(enc)
    hdr = parse_block_header(mv, 0)
    trees = np.asarray(hdr.tree, np.int16)
    packed, counts, depths = native.deserialize_trees(
        np.concatenate([trees, trees]),
        np.array([0, len(trees)], np.int64),
        np.array([len(trees), len(trees)], np.int32))
    assert counts[0] == counts[1] > 0

    # 3. Adversarial: truncated, garbage, bit-flipped streams through the
    # scanner (must return error codes, never crash or overflow).
    good = hostref.encode(b"the quick brown fox" * 100, 64)
    cases = [good[:k] for k in range(0, min(len(good), 96))]
    cases += [b"\xff" * 64, b"\x00" * 64, good + b"\x01\x02\x03"]
    g = bytearray(good)
    for i in rng.integers(0, len(good), 200):
        g2 = bytearray(g)
        g2[i] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(g2))
    for case in cases:
        buf = np.frombuffer(case, np.uint8)
        err, *_ = native.scan_stream(buf, decode=True,
                                     out_cap=len(case) * 8 + 16)
        assert err in (0, 3, 5, 6), err

    # 4. walk_progress on partial payloads (every prefix length).
    enc = hostref.encode(b"abracadabra" * 50, 0)
    hdr = parse_block_header(memoryview(enc), 0)
    payload = np.frombuffer(enc, np.uint8, offset=hdr.payload_off)
    for k in range(len(payload) + 1):
        native.walk_progress(np.asarray(hdr.tree, np.int16), payload[:k],
                             hdr.n_sym)

    # 5. Header scan on garbage / tiny / truncated inputs, cross-checked
    # against the numpy predicate on a well-formed stream.
    from libhuffman_tpu.format import find_candidate_headers
    big = hostref.encode(bytes(rng.integers(0, 256, 40000, np.uint8)), 512)
    for case in (b"", b"\x00" * 9, b"\xff" * 333, big, big[:11], good):
        buf = np.frombuffer(case, np.uint8)
        got = native.find_headers(buf)
        exp = find_candidate_headers(buf)
        assert np.array_equal(got, exp), len(case)

    # 6. stage_plan edge offsets: beyond-end, zero caps, caps past the
    # stream end, ragged non-word tails (must zero-fill, never over-read).
    data = np.frombuffer(big, np.uint8)
    offs = np.array([0, len(big) - 3, len(big), -1, 17], np.int64)
    caps = np.array([64, 100, 50, 10, len(big) * 2], np.int64)
    rows = native.stage_plan(data, offs, caps, 64)
    assert rows.shape == (5, 64)
    assert rows[3].sum() == 0  # off = -1 row stays zero

    # 7. assemble_blocks round-trips against the Python packer.
    from libhuffman_tpu.format import pack_block
    blocks = [b"hello world", bytes(rng.integers(0, 256, 777, np.uint8))]
    encs = [hostref.encode_block(np.frombuffer(b, np.uint8))
            for b in blocks]
    hdrs = [parse_block_header(memoryview(e), 0) for e in encs]
    tl = max(len(h.tree) for h in hdrs)
    trees = np.zeros((3, tl), np.int16)
    tree_lens = np.zeros(3, np.int32)
    pl = max(len(e) - h.payload_off for e, h in zip(encs, hdrs))
    pays = np.zeros((3, pl), np.uint8)
    pay_lens = np.zeros(3, np.int64)
    n_sym = np.zeros(3, np.uint64)
    for i, (e, h) in enumerate(zip(encs, hdrs)):
        trees[i, : len(h.tree)] = h.tree
        tree_lens[i] = len(h.tree)
        seg = np.frombuffer(e, np.uint8, offset=h.payload_off)
        pays[i, : len(seg)] = seg
        pay_lens[i] = len(seg)
        n_sym[i] = h.n_sym
    # Row 2 stays n_sym = 0: padding, must be skipped.
    got = native.assemble_blocks(n_sym, trees, tree_lens, pays, pay_lens)
    assert got == b"".join(encs), "assemble_blocks mismatch"

    print("native sanitizer pass OK")


if __name__ == "__main__":
    main()
