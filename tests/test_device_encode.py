"""Device (jitted, CPU-backend in tests) encode vs host-exact codec and oracle."""

import numpy as np
import pytest

from libhuffman_tpu import encode as enc_mod
from libhuffman_tpu.ops import hostref
from oracle import ref_compress


def _check(data: bytes, blocksize: int):
    got = enc_mod.encode(data, blocksize)
    want = hostref.encode(data, blocksize)
    assert got == want
    assert hostref.decode(got) == data


def test_golden_small():
    _check(b"0123456789", 65536)
    _check(b"1", 256)
    _check(b"aab", 65536)
    _check(b"aabba", 2)


def test_single_symbol_runs():
    _check(b"a" * 1000, 131072)
    _check(b"\x00" * 4096, 256)


def test_all_256_symbols():
    _check(bytes(range(256)) * 17, 1024)


def test_multiblock_batching():
    data = (b"The quick brown fox jumps over the lazy dog. " * 1000)[:40000]
    _check(data, 1024)  # 40 blocks: exercises batch path
    got = enc_mod.encode(data, 512, batch_blocks=16)  # multiple batches
    assert got == hostref.encode(data, 512)


@pytest.mark.parametrize("seed", range(6))
def test_random_vs_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 20000))
    kinds = [
        lambda: rng.integers(0, 256, n, dtype=np.uint8),
        lambda: rng.integers(97, 105, n, dtype=np.uint8),
        lambda: rng.choice(
            np.frombuffer(b" etaoinshrdlu", np.uint8),
            n,
            p=np.array([18, 10, 8, 8, 7, 7, 7, 6, 6, 6, 6, 6, 5]) / 100,
        ).astype(np.uint8),
    ]
    data = kinds[seed % 3]().tobytes()
    bs = int(rng.choice([0, 100, 1024, 65536]))
    got = enc_mod.encode(data, bs)
    assert got == ref_compress(data, bs if bs else len(data))
    assert hostref.decode(got) == data


def test_deep_tree_device_path():
    # Fibonacci frequencies make the deepest trees per byte: 22 symbols
    # (~17 KB) reach code depth ~20 — well past the resolve-LUT width but
    # inside the 32-bit device fast path — at a shape CPU tests can jit.
    counts = [1, 1]
    while len(counts) < 22:
        counts.append(counts[-1] + counts[-2])
    data = b"".join(bytes([i]) * c for i, c in enumerate(counts))
    _check(data, 0)


def test_overflow_flag_on_crafted_histogram():
    # Depth > MAX_CODE_BITS needs a multi-MB block of real data (Fib(34)
    # bytes); flag correctness is checked on a crafted histogram instead —
    # the encode driver re-routes flagged blocks to the host codec.
    import jax.numpy as jnp

    from libhuffman_tpu.ops import device as dev

    counts = [1, 1]
    while len(counts) < 40:
        counts.append(counts[-1] + counts[-2])
    freqs = np.zeros((1, 512), np.int32)
    freqs[0, : len(counts)] = counts
    left, right, parent, pbit, root = dev.build_trees(jnp.asarray(freqs))
    codes, lens, overflow = dev.extract_codes(parent, pbit)
    assert bool(np.asarray(overflow)[0])

    shallow = np.zeros((1, 512), np.int32)
    shallow[0, :4] = [3, 3, 3, 3]
    left, right, parent, pbit, root = dev.build_trees(jnp.asarray(shallow))
    codes, lens, overflow = dev.extract_codes(parent, pbit)
    assert not bool(np.asarray(overflow)[0])


def test_non_pow2_1024_multiple_blocksizes():
    """Blocksizes that are multiples of 1024 but NOT powers of two (3072,
    5120) must route around the pow2-only merge-tree packer instead of
    tripping its assert inside jit (round-5 regression fix)."""
    from libhuffman_tpu import decode as dec_mod
    from libhuffman_tpu import encode as enc_mod
    from libhuffman_tpu.ops import hostref

    data = (b"abcdefg hijklmnop " * 800)[:12 << 10]
    for bs in (3072, 5120):
        enc = enc_mod.encode(data, bs)
        assert enc == hostref.encode(data, bs), bs
        assert dec_mod.decode(enc) == data, bs
