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

    print("native sanitizer pass OK")


if __name__ == "__main__":
    main()
