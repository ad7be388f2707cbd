"""Benchmark harness: combined encode+decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Corpus: enwik8 if present (./enwik8 or $ENWIK8), else a deterministic
100 MB enwik-like synthetic text (Zipf-weighted word soup — similar symbol
entropy to English text).  ``vs_baseline`` compares against the compiled
C reference (single core, this machine) on the same corpus, since the
reference publishes no numbers (BASELINE.md).

Environment knobs: BENCH_MB (corpus size cap, default 100), BENCH_BLOCK
(blocksize, default 65536), BENCH_SKIP_REF=1 (skip the C baseline).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def corpus(n_bytes: int) -> bytes:
    for cand in (os.environ.get("ENWIK8"), "enwik8", "/root/enwik8",
                 "/tmp/enwik8"):
        if cand and os.path.exists(cand):
            with open(cand, "rb") as f:
                return f.read(n_bytes)
    # Deterministic enwik-like text: Zipf-weighted vocabulary.
    rng = np.random.default_rng(42)
    vocab = []
    letters = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz", np.uint8)
    for i in range(4096):
        ln = 1 + int(rng.integers(1, 9))
        vocab.append(bytes(rng.choice(letters, ln)) + b" ")
    ranks = np.arange(1, 4097, dtype=np.float64)
    probs = (1 / ranks) / (1 / ranks).sum()
    words = rng.choice(4096, size=n_bytes // 5, p=probs)
    out = b"".join(vocab[w] for w in words)
    while len(out) < n_bytes:
        out += out
    return out[:n_bytes]


def time_call(fn, *args, repeat=3):
    best = float("inf")
    r = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        r = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return r, best


def main():
    mb = int(os.environ.get("BENCH_MB", "100"))
    bs = int(os.environ.get("BENCH_BLOCK", "65536"))
    data = corpus(mb << 20)
    n = len(data)

    from libhuffman_tpu import decode as dec_mod
    from libhuffman_tpu import encode as enc_mod

    # Warm up (compile) once, then measure.
    enc = enc_mod.encode(data, bs)
    dec = dec_mod.decode(enc)
    assert dec == data, "roundtrip failure in bench"
    enc2, t_enc = time_call(enc_mod.encode, data, bs, repeat=2)
    assert enc2 == enc
    _, t_dec = time_call(dec_mod.decode, enc, repeat=2)

    gbps = n / (t_enc + t_dec) / 1e9
    enc_gbps = n / t_enc / 1e9
    dec_gbps = n / t_dec / 1e9

    vs = None
    if os.environ.get("BENCH_SKIP_REF") != "1":
        try:
            from oracle import ref_compress, ref_decompress

            sub = data[: min(n, 16 << 20)]  # reference is slow; sample
            r_enc, rt_enc = time_call(ref_compress, sub, bs, repeat=1)
            _, rt_dec = time_call(ref_decompress, r_enc, repeat=1)
            ref_gbps = len(sub) / (rt_enc + rt_dec) / 1e9
            vs = gbps / ref_gbps
        except Exception:
            vs = None

    print(json.dumps({
        "metric": "enwik-corpus combined encode+decode throughput (1 chip)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "bytes": n, "blocksize": bs,
            "encode_gbps": round(enc_gbps, 4),
            "decode_gbps": round(dec_gbps, 4),
            "ratio": round(len(enc) / n, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
