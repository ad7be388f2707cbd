"""TPU capability probe: measures the hardware/runtime constants that shape
the codec's kernel design.  Run on the real chip; prints one line per probe.
"""

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


def timeit(fn, *args, repeat=5):
    fn(*args)  # warm
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8,), jnp.int32)
    t = timeit(tiny, x, repeat=20)
    print(f"dispatch: {t*1e3:.3f} ms", flush=True)

    # h2d / d2h with non-trivial content (avoid host-buffer aliasing)
    h = np.random.randint(0, 255, 1 << 26, dtype=np.uint8)
    t = timeit(lambda a: jax.device_put(a, dev), h, repeat=3)
    print(f"h2d: {len(h)/t/1e9:.3f} GB/s ({t*1e3:.1f} ms / 64MB)", flush=True)

    @jax.jit
    def bump(a):
        return a ^ 1

    d = bump(jax.device_put(h, dev))
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    hh = np.asarray(d)
    t = time.perf_counter() - t0
    assert hh[0] == h[0] ^ 1
    print(f"d2h: {len(h)/t/1e9:.3f} GB/s ({t*1e3:.1f} ms / 64MB)", flush=True)

    @jax.jit
    def vpu(a, b):
        x = a
        for _ in range(16):
            x = (x ^ b) + (x >> 3)
        return x

    a = jnp.arange(1 << 24, dtype=jnp.uint32).reshape(4096, 4096)
    t = timeit(vpu, a, a)
    print(f"vpu: {16*a.size/t/1e9:.2f} G u32-chain-iters/s", flush=True)

    # XLA gather baseline
    @jax.jit
    def gat(tab, idx):
        return jnp.take_along_axis(tab, idx, axis=1)

    B, N = 64, 1 << 18
    tab_s = jnp.arange(B * 4096, dtype=jnp.uint32).reshape(B, 4096)
    idx_s = jnp.asarray(np.random.randint(0, 4096, (B, N)), jnp.int32)
    t = timeit(gat, tab_s, idx_s)
    print(f"xla_gather(4k tab): {B*N/t/1e6:.1f} M lookups/s", flush=True)

    # one-hot MXU gather, 256-entry table (the encode-path lookup)
    from libhuffman_tpu.ops import mxu_gather

    tab256b = jnp.arange(B * 256, dtype=jnp.uint32).reshape(B, 256)
    idx256b = jnp.asarray(np.random.randint(0, 256, (B, N)), jnp.int32)

    @jax.jit
    def mg(tab, idx):
        return mxu_gather.gather_u32(tab, idx)

    t = timeit(mg, tab256b, idx256b)
    print(f"mxu_gather(256 tab): {B*N/t/1e6:.1f} M lookups/s", flush=True)

    # --- Pallas in-kernel probes ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, LANE = 256, 512

    def run(name, kernel, out_shape, inputs, specs, n_ops):
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            f = jax.jit(f)
            t = timeit(f, *inputs)
            print(f"{name}: {n_ops/t/1e6:.1f} M lookups/s", flush=True)
        except Exception as e:
            print(f"{name} FAILED:", str(e)[:400].replace(chr(10), " "), flush=True)

    tabp = jnp.arange(4096, dtype=jnp.uint32).reshape(1, 4096)
    idxp = jnp.asarray(np.random.randint(0, 4096, (SUB, LANE)), jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def k_lut_loop(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (SUB, 4096))

        def body(i, acc):
            v = jnp.take_along_axis(tab, (idx_ref[:] + i) & 4095, axis=1)
            return acc ^ v

        out_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((SUB, LANE), jnp.uint32))

    run("pallas take_along(4k shared) x64",
        k_lut_loop, jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
        (tabp, idxp), [vspec, vspec], 64 * SUB * LANE)

    tab256 = jnp.arange(256, dtype=jnp.uint32).reshape(1, 256)
    idx256 = jnp.asarray(np.random.randint(0, 256, (SUB, LANE)), jnp.int32)

    def k_lut256(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (SUB, 256))

        def body(i, acc):
            v = jnp.take_along_axis(tab, (idx_ref[:] + i) & 255, axis=1)
            return acc ^ v

        out_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((SUB, LANE), jnp.uint32))

    run("pallas take_along(256 shared) x64",
        k_lut256, jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
        (tab256, idx256), [vspec, vspec], 64 * SUB * LANE)

    # per-row tables (each sublane row its own table): decode across blocks
    tab_rows = jnp.asarray(
        np.random.randint(0, 1 << 30, (SUB, 256), dtype=np.int64), jnp.uint32)

    def k_lut_rows(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            v = jnp.take_along_axis(tab_ref[:], (idx_ref[:] + i) & 255, axis=1)
            return acc ^ v

        out_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((SUB, LANE), jnp.uint32))

    run("pallas take_along(per-row 256 tab) x64",
        k_lut_rows, jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
        (tab_rows, idx256), [vspec, vspec], 64 * SUB * LANE)

    # dynamic-slice RMW store at scalar offset
    def k_ds(off_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        o = off_ref[0]
        cur = out_ref[pl.ds(o, 8), :]
        out_ref[pl.ds(o, 8), :] = val_ref[:] | cur

    try:
        f = pl.pallas_call(
            k_ds,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        f = jax.jit(f)
        r = f(jnp.array([3], jnp.int32), jnp.ones((8, 128), jnp.uint32))
        print("pallas dynamic-slice RMW store: OK sum=", int(np.asarray(r).sum()),
              flush=True)
    except Exception as e:
        print("pallas ds store FAILED:", str(e)[:300].replace(chr(10), " "),
              flush=True)

    # scalar SMEM loop speed (sequential walk viability)
    def k_scalar(idx_ref, out_ref, s_ref):
        s_ref[0] = 0

        def body(i, c):
            return (c + idx_ref[c & 255, 0]) & 0x7FFFFFFF

        c = jax.lax.fori_loop(0, 4096, body, 0)
        out_ref[0, 0] = c

    try:
        f = pl.pallas_call(
            k_scalar,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        )
        f = jax.jit(f)
        idx = jnp.asarray(np.random.randint(1, 7, (256, 1)), jnp.int32)
        t = timeit(f, idx)
        print(f"pallas scalar chase: {4096/t/1e6:.1f} M steps/s", flush=True)
    except Exception as e:
        print("pallas scalar FAILED:", str(e)[:300].replace(chr(10), " "), flush=True)


if __name__ == "__main__":
    main()
