"""Deterministic corpus families for bench + corpus tests.

BASELINE.json names enwik8 and Silesia; neither file exists in this
environment (zero egress), so the families below synthesize the same
*tree-shape regimes* those corpora exercise (round-3 probe analysis:
enwik8 blocks ~205 distinct bytes, depth 12-16 trees; Silesia mixes
near-incompressible medical/binary data with text and structured records):

  text    enwik-like Zipf word mix over a full-width byte alphabet
          (letters + markup + rare UTF-8-ish tail): depth 12-18 trees.
  xray    near-incompressible: full-byte alphabet with a mild bias
          (depth 8-10, ratio ~1.0) — the x-ray/sao regime.
  samba   binary-with-text: structured little-endian records (zero-heavy),
          zero runs, and ASCII identifiers — skewed trees with deep tails
          and all-256-symbol blocks.
  mixed   256 KiB segments cycling through the three families — the
          Silesia-like composite the bench reports as its second corpus.

All generators are seeded and pure: the same bytes on every run/host.
"""

from __future__ import annotations

import numpy as np


def text(n_bytes: int, seed: int = 42) -> bytes:
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz", np.uint8)
    markup = np.frombuffer(b"<>/=\"'[]{}|&#;:.,()-_0123456789ABCDEFGHIJKLMN",
                           np.uint8)
    vocab = []
    for i in range(4096):
        ln = 1 + int(rng.integers(1, 9))
        word = bytes(rng.choice(letters, ln))
        r = i % 16
        if r == 13:  # markup-ish token
            word = bytes(rng.choice(markup, max(2, ln)))
        elif r == 15:  # rare high-byte (UTF-8-ish) token tail
            word = bytes(rng.integers(128, 256, 2, dtype=np.uint8).tolist())
        vocab.append(word + b" ")
    ranks = np.arange(1, 4097, dtype=np.float64)
    probs = (1 / ranks) / (1 / ranks).sum()
    words = rng.choice(4096, size=n_bytes // 5, p=probs)
    out = b"".join(vocab[w] for w in words)
    while len(out) < n_bytes:
        out += out
    return out[:n_bytes]


def xray(n_bytes: int, seed: int = 9) -> bytes:
    rng = np.random.default_rng(seed)
    # 12-bit sensor samples packed to bytes: full byte alphabet, mildly
    # non-uniform (high nibble biased), near-incompressible.
    raw = rng.normal(2048, 600, n_bytes).clip(0, 4095).astype(np.uint16)
    lo = (raw & 0xFF).astype(np.uint8)
    hi = (raw >> 8).astype(np.uint8)
    return np.stack([lo, hi], axis=1).reshape(-1)[:n_bytes].tobytes()


def samba(n_bytes: int, seed: int = 17) -> bytes:
    rng = np.random.default_rng(seed)
    pieces = []
    size = 0
    idents = [bytes(rng.choice(np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz_", np.uint8),
        int(rng.integers(4, 13)))) for _ in range(256)]
    while size < n_bytes:
        kind = int(rng.integers(0, 4))
        if kind == 0:  # zero run
            seg = bytes(int(rng.integers(64, 4096)))
        elif kind == 1:  # LE u32 records with small values (zero-heavy)
            vals = rng.integers(0, 1 << int(rng.integers(4, 20)),
                                1024, dtype=np.uint64).astype(np.uint32)
            seg = vals.tobytes()
        elif kind == 2:  # ASCII identifier table
            seg = b"\x00".join(idents[int(i)] for i in
                               rng.integers(0, 256, 512))
        else:  # raw machine-code-ish bytes (all 256 symbols)
            seg = rng.integers(0, 256, int(rng.integers(512, 8192)),
                               dtype=np.uint16).astype(np.uint8).tobytes()
        pieces.append(seg)
        size += len(seg)
    return b"".join(pieces)[:n_bytes]


def mixed(n_bytes: int, seed: int = 3) -> bytes:
    """Silesia-like composite: 256 KiB segments cycling the families."""
    seg = 256 << 10
    gens = (text, xray, samba)
    pieces = []
    i = 0
    while sum(map(len, pieces)) < n_bytes:
        pieces.append(gens[i % 3](seg, seed=seed + i))
        i += 1
    return b"".join(pieces)[:n_bytes]


FAMILIES = {"text": text, "xray": xray, "samba": samba, "mixed": mixed}
