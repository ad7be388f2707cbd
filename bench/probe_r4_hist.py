"""Round-4 histogram kernel shootout (real-TPU probe).

The round-3 histogram (one 64 KiB block per grid step, u8 input, nibble
block-diagonal contraction) measures ~24 ms / 16.8 MB — ~80 us per grid
step against ~10 us of compute (PERF.md §5).  Variants probed here:

  A  round-3 kernel as shipped (GB=1, u8 input)
  B  GB blocks per grid step (the VERDICT's rematch: overhead / GB)
  C  u32-word input (no in-kernel u8 relayout), 128x128 matmuls
  F  u32-word input, K=512 per matmul (4 planes x 4 row-tiles)

Timing discipline per PERF.md §1: salted inputs, checksum transfer forced,
best-of over reps, dispatch baseline (trivial sum over the same input)
subtracted.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

B, N = 256, 65536  # 16.8 MB batch, the bench shape


def timed(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(f(jnp.uint32(0), *args))  # compile
    best = min(
        (lambda t0: (np.asarray(f(jnp.uint32(s), *args)),
                     time.perf_counter() - t0)[1])(time.perf_counter())
        for s in (1, 2, 3)
    )
    print(f"  {name:28s} {best*1e3:8.2f} ms", flush=True)
    return best


# --- variant A/B: u8 input, R x (128, K) x (K, 128) block-diag contraction
def hist_u8(GB):
    R = N // 8 // 2048
    K = 2048

    def kernel(bytes_ref, out_ref):
        qiota = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        seg16 = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0) * 16
        for g in range(GB):
            acc = jnp.zeros((128, 128), jnp.float32)
            for r in range(R):
                seg = bytes_ref[g, pl.ds(r * 8, 8), :].astype(jnp.int32)
                hi = ((seg >> 4).reshape(8, 1, K) + seg16)
                lo = ((seg & 15).reshape(8, 1, K) + seg16)
                hiR = jnp.broadcast_to(hi, (8, 16, K)).reshape(128, K)
                loR = jnp.broadcast_to(lo, (8, 16, K)).reshape(128, K)
                A = (hiR == qiota).astype(jnp.bfloat16)
                Bm = (loR == qiota).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    A, Bm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out = jnp.zeros((16, 16), jnp.float32)
            for s in range(8):
                out = out + acc[16 * s:16 * s + 16, 16 * s:16 * s + 16]
            out_ref[g] = out

    def run(salt, blocks):
        x = (blocks ^ salt.astype(jnp.uint8)).reshape(B, 8 * R, K)
        cnt = pl.pallas_call(
            kernel,
            grid=(B // GB,),
            in_specs=[pl.BlockSpec((GB, 8 * R, K), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GB, 16, 16), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 16, 16), jnp.float32),
        )(x)
        return jnp.sum(cnt.astype(jnp.int32))

    return run


# --- variant C/F: u32 input, per-plane block-diag one-hots
def hist_u32(KW, GB=1):
    # KW words per matmul column count; rows of (8, KW) words per tile.
    RW = N // 4 // (8 * KW)  # word row-tiles per block

    def kernel(w_ref, out_ref):
        qiota = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        seg16 = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0) * 16
        for g in range(GB):
            acc = jnp.zeros((128, 128), jnp.float32)
            for r in range(RW):
                w = w_ref[g, pl.ds(r * 8, 8), :]
                for sh in (0, 8, 16, 24):
                    byte = ((w >> jnp.uint32(sh)) & jnp.uint32(255)
                            ).astype(jnp.int32)
                    hi = ((byte >> 4).reshape(8, 1, KW) + seg16)
                    lo = ((byte & 15).reshape(8, 1, KW) + seg16)
                    hiR = jnp.broadcast_to(hi, (8, 16, KW)).reshape(128, KW)
                    loR = jnp.broadcast_to(lo, (8, 16, KW)).reshape(128, KW)
                    A = (hiR == qiota).astype(jnp.bfloat16)
                    Bm = (loR == qiota).astype(jnp.bfloat16)
                    acc = acc + jax.lax.dot_general(
                        A, Bm, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            out = jnp.zeros((16, 16), jnp.float32)
            for s in range(8):
                out = out + acc[16 * s:16 * s + 16, 16 * s:16 * s + 16]
            out_ref[g] = out

    def run(salt, words):
        x = (words ^ salt).reshape(B, 8 * RW, KW)
        cnt = pl.pallas_call(
            kernel,
            grid=(B // GB,),
            in_specs=[pl.BlockSpec((GB, 8 * RW, KW), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GB, 16, 16), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 16, 16), jnp.float32),
        )(x)
        return jnp.sum(cnt.astype(jnp.int32))

    return run


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (B, N), dtype=np.uint8)
    blocks = jnp.asarray(raw)
    words = jnp.asarray(raw.view(np.uint32).reshape(B, -1))

    def base(salt, x):
        return jnp.sum((x ^ salt.astype(x.dtype)).astype(jnp.uint32))

    tb8 = timed("baseline-sum u8", base, blocks)
    tb32 = timed("baseline-sum u32", base, words)
    tA = timed("A u8 GB=1 (r3 ship)", hist_u8(1), blocks)
    tB2 = timed("B u8 GB=4", hist_u8(4), blocks)
    tB8 = timed("B u8 GB=8", hist_u8(8), blocks)
    tC = timed("C u32 KW=128 GB=1", hist_u32(128), blocks=None or words)
    tC8 = timed("C u32 KW=128 GB=8", hist_u32(128, 8), words)
    tF = timed("F u32 KW=512 GB=1", hist_u32(512), words)
    tF8 = timed("F u32 KW=512 GB=8", hist_u32(512, 8), words)
    for n, t, tb in [("A", tA, tb8), ("B4", tB2, tb8), ("B8", tB8, tb8),
                     ("C", tC, tb32), ("C8", tC8, tb32),
                     ("F", tF, tb32), ("F8", tF8, tb32)]:
        k = t - tb
        print(f"{n:3s} kernel ~{k*1e3:7.2f} ms  "
              f"{B*N/max(k,1e-9)/1e9:6.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
