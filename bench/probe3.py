"""Probe 3: fresh-transfer bandwidth matrix + segmented Pallas table gather."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    dev = jax.devices()[0]

    @jax.jit
    def bump(a, s):
        return a ^ s

    print("== D2H fresh results ==", flush=True)
    for mb in (1, 4, 16, 64):
        n = mb << 20
        base = bump(jax.device_put(np.zeros(n, np.uint8), dev), jnp.uint8(1))
        jax.block_until_ready(base)
        for name, fn in [
            ("asarray", lambda d: np.asarray(d)),
            ("device_get", lambda d: jax.device_get(d)),
            ("async+get", lambda d: (d.copy_to_host_async(), np.asarray(d))[1]),
        ]:
            best = float("inf")
            for i in range(2):
                d = bump(base, jnp.uint8(i + 2))
                jax.block_until_ready(d)
                t0 = time.perf_counter()
                fn(d)
                best = min(best, time.perf_counter() - t0)
            print(f"d2h {mb}MB {name}: {n/best/1e9:.4f} GB/s", flush=True)

    print("== D2H parallel (4 concurrent slices) ==", flush=True)
    n = 16 << 20
    ds = []
    for i in range(4):
        d = bump(jax.device_put(np.zeros(n, np.uint8), dev), jnp.uint8(i + 10))
        jax.block_until_ready(d)
        ds.append(d)
    t0 = time.perf_counter()
    for d in ds:
        d.copy_to_host_async()
    outs = [np.asarray(d) for d in ds]
    t = time.perf_counter() - t0
    print(f"d2h 4x16MB async-all-then-get: {4*n/t/1e9:.4f} GB/s", flush=True)

    print("== H2D fresh ==", flush=True)
    for mb in (16, 64):
        n = mb << 20
        best = float("inf")
        for i in range(2):
            h = np.random.randint(0, 255, n, dtype=np.uint8)
            t0 = time.perf_counter()
            d = jax.device_put(h, dev)
            jax.block_until_ready(d)
            best = min(best, time.perf_counter() - t0)
        print(f"h2d {mb}MB fresh: {n/best/1e9:.4f} GB/s", flush=True)

    # --- segmented 4096-entry table gather in Pallas ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, LANE, NSEG = 512, 512, 32  # 4096-entry table as (32,128)

    def k_seg(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        lo = idx & 127
        hi = idx >> 7

        def body(i, acc):
            v = jnp.take_along_axis(
                jnp.broadcast_to(tab_ref[pl.ds(i, 1), :], idx.shape), lo, axis=1)
            return jnp.where(hi == i, v, acc)

        out_ref[:] = jax.lax.fori_loop(
            0, NSEG, body, jnp.zeros(idx.shape, jnp.uint32))

    tab = jnp.arange(4096, dtype=jnp.uint32).reshape(NSEG, 128)
    idx = jnp.asarray(np.random.randint(0, 4096, (SUB, LANE)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_seg,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        r = f(tab, idx)
        ok = np.array_equal(np.asarray(r), np.asarray(idx))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(tab, idx))
            best = min(best, time.perf_counter() - t0)
        print(f"pallas segmented 4k gather: exact={ok} "
              f"{SUB*LANE/best/1e6:.1f} M lookups/s", flush=True)
    except Exception as e:
        import traceback
        print("ERR seg gather:", traceback.format_exc()[-1500:], flush=True)

    # repeat-in-kernel version to remove dispatch overhead
    def k_seg_loop(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[:]

        def outer(j, acc0):
            idx = (idx0 + j) & 4095
            lo = idx & 127
            hi = idx >> 7

            def body(i, acc):
                v = jnp.take_along_axis(
                    jnp.broadcast_to(tab_ref[pl.ds(i, 1), :], idx.shape), lo,
                    axis=1)
                return jnp.where(hi == i, v, acc)

            return acc0 ^ jax.lax.fori_loop(
                0, NSEG, body, jnp.zeros(idx.shape, jnp.uint32))

        out_ref[:] = jax.lax.fori_loop(
            0, 16, outer, jnp.zeros(idx0.shape, jnp.uint32))

    try:
        f = jax.jit(pl.pallas_call(
            k_seg_loop,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        jax.block_until_ready(f(tab, idx))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(tab, idx))
            best = min(best, time.perf_counter() - t0)
        print(f"pallas segmented 4k gather x16: {16*SUB*LANE/best/1e6:.1f} "
              f"M lookups/s", flush=True)
    except Exception as e:
        import traceback
        print("ERR seg loop:", traceback.format_exc()[-1500:], flush=True)

    # 256-entry table: 2 segments
    def k_seg256(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[:]

        def outer(j, acc0):
            idx = (idx0 + j) & 255
            lo = idx & 127
            hi = idx >> 7

            def body(i, acc):
                v = jnp.take_along_axis(
                    jnp.broadcast_to(tab_ref[pl.ds(i, 1), :], idx.shape), lo,
                    axis=1)
                return jnp.where(hi == i, v, acc)

            return acc0 ^ jax.lax.fori_loop(
                0, 2, body, jnp.zeros(idx.shape, jnp.uint32))

        out_ref[:] = jax.lax.fori_loop(
            0, 16, outer, jnp.zeros(idx0.shape, jnp.uint32))

    tab256 = jnp.arange(256, dtype=jnp.uint32).reshape(2, 128)
    idx256 = jnp.asarray(np.random.randint(0, 256, (SUB, LANE)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            k_seg256,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        jax.block_until_ready(f(tab256, idx256))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(tab256, idx256))
            best = min(best, time.perf_counter() - t0)
        print(f"pallas segmented 256 gather x16: {16*SUB*LANE/best/1e6:.1f} "
              f"M lookups/s", flush=True)
    except Exception as e:
        import traceback
        print("ERR seg256:", traceback.format_exc()[-1500:], flush=True)


if __name__ == "__main__":
    main()
