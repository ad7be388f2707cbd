"""Round-5 decode shootout (real-TPU probe).

Round-4 decode budget per 67 MB out (bench/phases.py, BENCH_MB=64):
resolve 31 ms, chain+translate/transpose 27 ms, emit 26 ms, bookkeeping 6 ms.
The chain phase hides two separable costs: the XLA translate+transpose of the
resolve meta plane into position-major layout (~13 ms) and the sequential
chain kernel itself (~14 ms).  Hypotheses probed here:

  A  chain kernel rate vs B: plans run at B=512 -> (4, 128) sub-tile
     operands, issue-bound at ~3.5 cyc/instr; B=1024 gives full (8, 128)
     vregs -> ~2x blocks per instruction for the same op stream.
  D  XLA translate+transpose (current): u16 raw meta -> u32 packed plane ->
     (NP, B).
  E  pair-packed variant: u16 composite (sym<<8|ln) packed 2/u32 ->
     transpose half the volume -> (NP/2, B).
  E2 raw u16 transpose (no packing) -> (NP, B) u16.
  F  Pallas transpose kernel feasibility: (B-tile, 4096) u32 tiles
     transposed in-VMEM (does Mosaic lower jnp.transpose, and at what rate?)
  C  pair-u16 chain kernel: consumes E's (NP/2, B) plane, extracts
     (ln, sym) and computes the schedule mask in-kernel (~3 extra
     ops/position) — trades kernel ops for transpose bytes.

Timing discipline per PERF.md section 1: salted inputs, checksum transfer
forced, best-of reps, trivial-dispatch baseline subtracted.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libhuffman_tpu.ops import decode_v3 as ddec  # noqa: E402

NP = 1 << 19  # positions/block, the bench plan shape


def timed(name, fn, *args, reps=(1, 2, 3)):
    f = jax.jit(fn)
    np.asarray(f(jnp.uint32(0), *args))  # compile
    best = float("inf")
    for s in reps:
        t0 = time.perf_counter()
        np.asarray(f(jnp.uint32(s), *args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:36s} {best*1e3:8.2f} ms", flush=True)
    return best


def synth_meta16(B, rng):
    """Plausible raw resolve output: u16 composite sym<<8|ln, ln in 2..19."""
    ln = rng.integers(2, 20, (B, 32, NP // 32), dtype=np.uint16)
    sym = rng.integers(0, 256, (B, 32, NP // 32), dtype=np.uint16)
    return (sym << 8) | ln


# --- D: current XLA translate+transpose (from u16 raw-entry layout) ------

def xla_current(salt, meta16):
    e = (meta16 ^ salt.astype(jnp.uint16)).astype(jnp.uint32)
    ln = e & 63
    sched = jnp.where(ln > 0, jnp.uint32(1) << (jnp.maximum(ln, 1) - 1),
                      jnp.uint32(0))
    mflat = sched | ((e >> 8) << 24)
    B = meta16.shape[0]
    mt = jnp.transpose(mflat, (2, 1, 0)).reshape(NP, B)
    return jnp.sum(mt[::4096])


# --- E: pair-packed u32 transpose (half volume) --------------------------

def xla_pair(salt, meta16):
    e = (meta16 ^ salt.astype(jnp.uint16)).astype(jnp.uint32)
    m2 = e[:, 0::2, :] | (e[:, 1::2, :] << 16)  # (B, 16, W)
    B = meta16.shape[0]
    mt = jnp.transpose(m2, (2, 1, 0)).reshape(NP // 2, B)
    return jnp.sum(mt[::4096])


# --- E2: raw u16 transpose -----------------------------------------------

def xla_u16(salt, meta16):
    e = meta16 ^ salt.astype(jnp.uint16)
    B = meta16.shape[0]
    mt = jnp.transpose(e, (2, 1, 0)).reshape(NP, B)
    return jnp.sum(mt[::4096].astype(jnp.uint32))


# --- F: Pallas in-VMEM transpose ----------------------------------------

def pallas_transpose(BT):
    """(B, S) u32 -> (S, B) via in-kernel jnp.transpose of (BT, 4096) tiles."""

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    def run(salt, x):
        B, S = x.shape
        y = pl.pallas_call(
            kernel,
            grid=(B // BT, S // 4096),
            in_specs=[pl.BlockSpec((BT, 4096), lambda b, t: (b, t),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((4096, BT), lambda b, t: (t, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, B), jnp.uint32),
        )(x ^ salt)
        return jnp.sum(y[::4096])

    return run


# --- C: pair-u16 chain kernel -------------------------------------------

SP = 512


def _chain_pair_body(SB: int):
    def kernel(meta_ref, start_ref, gw_ref, gr_ref, state_ref):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            state_ref[0] = jnp.full((SB, 128), 1, jnp.uint32)
            state_ref[1] = jnp.zeros((SB, 128), jnp.uint32)

        def stripe(j, carry):
            pend, cnt = carry
            word = pend & 0
            gw = pend & 0
            for h in range(16):
                m2 = meta_ref[16 * j + h].astype(jnp.uint32)
                for half in range(2):
                    t = 2 * h + half
                    if half == 0:
                        sym = (m2 >> 8) & 255
                        ln = m2 & 63
                    else:
                        sym = m2 >> 24
                        ln = (m2 >> 16) & 63
                    new = pend & 1
                    started = new == 1
                    word = word | (new << t)
                    sched = (jnp.uint32(1) << ln) >> 1
                    gw = jnp.where(started, (gw << 8) | sym, gw)
                    cnt = cnt + new
                    pend = (pend >> 1) | jnp.where(started, sched, 0)
                    if t % 8 == 7:
                        gw_ref[4 * j + t // 8] = gw
                        gr_ref[4 * j + t // 8] = cnt
                        gw = pend & 0
            start_ref[j] = word
            return pend, cnt

        pend, cnt = jax.lax.fori_loop(
            0, SP // 32, stripe, (state_ref[0], state_ref[1]))
        state_ref[0] = pend
        state_ref[1] = cnt

    return kernel


def chain_pair(salt, meta2):
    NP2, B = meta2.shape
    SB = B // 128
    start, gw, gr = pl.pallas_call(
        _chain_pair_body(SB),
        grid=(2 * NP2 // SP,),
        in_specs=[pl.BlockSpec((SP // 2, SB, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((SP // 32, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SP // 8, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SP // 8, SB, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * NP2 // 32, SB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((2 * NP2 // 8, SB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((2 * NP2 // 8, SB, 128), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((2, SB, 128), jnp.uint32)],
    )((meta2 ^ salt).astype(jnp.int32).reshape(NP2, SB, 128))
    return jnp.sum(start) + jnp.sum(gw[::64]) + jnp.sum(gr[::64])


def chain_current(salt, meta_t):
    # NOTE: post-round-5 chain_emit consumes the pair plane and returns
    # (start, gw, gc4, gr32); this probe predates that and is kept as the
    # measurement record that drove the change.
    outs = ddec.chain_emit(meta_t ^ salt)
    return sum(jnp.sum(o[::64]) for o in outs)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    for B in (512, 1024):
        print(f"-- B={B} ({B * NP / 1e6:.0f}M positions)", flush=True)
        m16 = jnp.asarray(synth_meta16(B, rng))

        def base16(salt, x):
            return jnp.sum((x[:, :, ::512] ^ salt.astype(jnp.uint16)
                            ).astype(jnp.uint32))

        tb = timed("baseline (slice sum)", base16, m16)
        tD = timed("D xla translate+transpose u32", xla_current, m16)
        tE = timed("E xla pair-packed u32 (half)", xla_pair, m16)
        tE2 = timed("E2 xla raw u16", xla_u16, m16)

        # chain inputs (synth, position-major)
        mt = jnp.asarray(
            rng.integers(0, 1 << 22, (NP, B), dtype=np.uint32)
            | (rng.integers(0, 256, (NP, B), dtype=np.uint32) << 24))
        tb2 = timed("baseline mt (slice sum)",
                    lambda s, x: jnp.sum(x[::512] ^ s), mt)
        tA = timed("A chain current (packed u32)", chain_current, mt)
        m2 = jnp.asarray(rng.integers(0, 1 << 32, (NP // 2, B),
                                      dtype=np.uint64).astype(np.uint32))
        # pair layout wants benign ln values; synthesize composite pairs
        lo = rng.integers(2, 20, (NP // 2, B), dtype=np.uint32)
        hi = rng.integers(2, 20, (NP // 2, B), dtype=np.uint32)
        sl = rng.integers(0, 256, (NP // 2, B), dtype=np.uint32)
        sh = rng.integers(0, 256, (NP // 2, B), dtype=np.uint32)
        m2 = jnp.asarray(lo | (sl << 8) | (hi << 16) | (sh << 24))
        tC = timed("C chain pair-u16 (in-kernel sched)", chain_pair, m2)

        n = B * NP
        for name, t, tbase in [("D", tD, tb), ("E", tE, tb), ("E2", tE2, tb),
                               ("A", tA, tb2), ("C", tC, tb2)]:
            k = max(t - tbase, 1e-9)
            print(f"  {name:3s} ~{k*1e3:7.2f} ms  {n/k/1e9:7.2f} G pos/s",
                  flush=True)

        # F: pallas transpose feasibility (u32, B-tile x 4096)
        try:
            x = jnp.asarray(rng.integers(0, 1 << 31, (B, NP // 32),
                                         dtype=np.uint32))
            tbF = timed("baseline x (slice sum)",
                        lambda s, y: jnp.sum(y[:, ::512] ^ s), x)
            for BT in (128, 256):
                if B % BT:
                    continue
                tF = timed(f"F pallas transpose BT={BT}",
                           pallas_transpose(BT), x)
                k = max(tF - tbF, 1e-9)
                print(f"  F{BT} ~{k*1e3:7.2f} ms  "
                      f"{B * (NP // 32) * 8 / k / 1e9:7.2f} GB/s moved",
                      flush=True)
        except Exception as e:
            print("  F pallas transpose FAILED:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
