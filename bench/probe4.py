"""Probe 4: realistic-shape kernel primitives for the codec designs.

 a) per-row segmented table gather (decode LUT / encode codebook): rows share
    a (rows, nseg*128) table; idx in [0, nseg*128).
 b) while_loop with vector state + scalar any() condition
 c) in-kernel (128,128) one-hot f32 matmul (encode scatter-add)
 d) dynamic-slice RMW store inside fori_loop (encode append)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print([n for n in dir(pltpu) if "ompiler" in n or "arams" in n], flush=True)


def bench(f, *args, n_ops=1, label=""):
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {n_ops/best/1e6:.1f} M ops/s  ({best*1e3:.3f} ms)", flush=True)
    return r


def main():
    R, NSEG = 512, 32  # rows, table segments of 128 (4096-entry per-row table)
    REP = 16

    # a) per-row segmented gather: tab (R, NSEG*128), idx (R, 128)
    def k_rowgather(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[:]

        def outer(j, acc0):
            idx = (idx0 * (j + 1)) & (NSEG * 128 - 1)
            lo = idx & 127
            hi = idx >> 7

            def body(i, acc):
                seg = tab_ref[:, pl.ds(i * 128, 128)]
                v = jnp.take_along_axis(seg, lo, axis=1)
                return jnp.where(hi == i, v, acc)

            return acc0 ^ jax.lax.fori_loop(
                0, NSEG, body, jnp.zeros(idx.shape, jnp.uint32), unroll=True)

        out_ref[:] = jax.lax.fori_loop(
            0, REP, outer, jnp.zeros(idx0.shape, jnp.uint32))

    tab = jnp.asarray(
        np.random.randint(0, 1 << 31, (R, NSEG * 128), dtype=np.int64), jnp.uint32)
    idx = jnp.asarray(np.random.randint(0, NSEG * 128, (R, 128)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_rowgather,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        r = bench(f, tab, idx, n_ops=REP * R * 128, label="row-gather 4k/row")
        # exactness check of one rep
        i1 = (np.asarray(idx) * 1) & (NSEG * 128 - 1)
        i2 = (np.asarray(idx) * 2) & (NSEG * 128 - 1)
        want = np.take_along_axis(np.asarray(tab), i1, axis=1)
        for j in range(1, REP):
            ij = (np.asarray(idx) * (j + 1)) & (NSEG * 128 - 1)
            want ^= np.take_along_axis(np.asarray(tab), ij, axis=1)
        print("   exact:", np.array_equal(np.asarray(r), want), flush=True)
    except Exception:
        import traceback
        print("ERR row-gather:", traceback.format_exc()[-800:], flush=True)

    # a2) same but 2-segment (256-entry per-row tables, encode codebook)
    def k_rowgather256(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[:]

        def outer(j, acc0):
            idx = (idx0 * (j + 1)) & 255
            lo = idx & 127
            hi = idx >> 7
            v0 = jnp.take_along_axis(tab_ref[:, pl.ds(0, 128)], lo, axis=1)
            v1 = jnp.take_along_axis(tab_ref[:, pl.ds(128, 128)], lo, axis=1)
            return acc0 ^ jnp.where(hi == 0, v0, v1)

        out_ref[:] = jax.lax.fori_loop(
            0, REP, outer, jnp.zeros(idx0.shape, jnp.uint32))

    tab2 = jnp.asarray(
        np.random.randint(0, 1 << 31, (R, 256), dtype=np.int64), jnp.uint32)
    idx2 = jnp.asarray(np.random.randint(0, 256, (R, 128)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_rowgather256,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        bench(f, tab2, idx2, n_ops=REP * R * 128, label="row-gather 256/row")
    except Exception:
        import traceback
        print("ERR row-gather256:", traceback.format_exc()[-800:], flush=True)

    # b) while_loop with vector state + scalar condition
    def k_while(x_ref, out_ref):
        def cond(st):
            i, v = st
            return jnp.logical_and(i < 64, jnp.any(v < 1000))

        def body(st):
            i, v = st
            return i + 1, v + (v & 7) + 1

        _, v = jax.lax.while_loop(cond, body, (0, x_ref[:]))
        out_ref[:] = v

    x = jnp.zeros((64, 128), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_while,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        r = f(x)
        print("while_loop vector-cond: OK", int(np.asarray(r)[0, 0]), flush=True)
    except Exception:
        import traceback
        print("ERR while:", traceback.format_exc()[-600:], flush=True)

    # c) in-kernel one-hot f32 matmul (128x128)@(128x8)
    def k_mm(oh_ref, v_ref, out_ref):
        def body(j, acc):
            return acc + jnp.dot(oh_ref[:], v_ref[:],
                                 preferred_element_type=jnp.float32)

        out_ref[:] = jax.lax.fori_loop(
            0, 64, body, jnp.zeros((128, 128), jnp.float32))

    oh = jnp.asarray(np.eye(128, dtype=np.float32))
    v = jnp.asarray(np.random.rand(128, 128), jnp.float32)
    try:
        f = jax.jit(pl.pallas_call(
            k_mm,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        bench(f, oh, v, n_ops=64 * 128 * 128 * 128, label="in-kernel mm MACs")
    except Exception:
        import traceback
        print("ERR mm:", traceback.format_exc()[-600:], flush=True)

    # d) dynamic-slice RMW store loop (sequential bit append pattern)
    def k_append(val_ref, off_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            o = off_ref[i]
            cur = out_ref[pl.ds(o, 8), :]
            out_ref[pl.ds(o, 8), :] = cur | val_ref[pl.ds(i * 8, 8), :]
            return 0

        jax.lax.fori_loop(0, 256, body, 0)

    vals = jnp.ones((2048, 128), jnp.uint32)
    offs = jnp.asarray(np.sort(np.random.randint(0, 4096 - 8, 256)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_append,
            out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        bench(f, vals, offs, n_ops=256, label="dyn RMW appends")
    except Exception:
        import traceback
        print("ERR append:", traceback.format_exc()[-600:], flush=True)


if __name__ == "__main__":
    main()
