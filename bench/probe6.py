"""Probe 6: static-shift roll throughput + per-lane variable bit shifts."""

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


def bench(f, *args, label=""):
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return r


def main():
    big = jnp.arange(512 * 128, dtype=jnp.uint32).reshape(512, 128)

    # 16 fori iters x 8 static rolls+selects = 128 roll+select ops
    def k_static(x_ref, o_ref):
        def body(i, acc):
            for j in range(8):
                s = 1 << j
                r1 = pltpu.roll(acc, s % 128, 1)
                lid = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
                y = jnp.where(lid >= (s % 128), r1, acc)
                acc = jnp.where((acc & 1) == 0, y, acc)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, 16, body, x_ref[:])

    f = jax.jit(pl.pallas_call(
        k_static,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    bench(f, big, label="128x static roll+2where on (512,128)")

    # per-lane variable shifts
    def k_vshift(x_ref, s_ref, o_ref):
        def body(i, acc):
            acc = (acc << (s_ref[:] & 31).astype(jnp.uint32)) | (
                acc >> ((32 - (s_ref[:] & 31)) & 31).astype(jnp.uint32))
            return acc ^ jnp.uint32(i)

        o_ref[:] = jax.lax.fori_loop(0, 128, body, x_ref[:])

    s = jnp.asarray(np.random.randint(0, 32, (512, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        k_vshift,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    bench(f, big, s, label="128x per-lane var shift on (512,128)")

    # fori-loop iteration overhead: empty-ish body
    def k_loop(x_ref, o_ref):
        def body(i, acc):
            return acc + 1

        o_ref[:] = jax.lax.fori_loop(0, 4096, body, x_ref[:])

    f = jax.jit(pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    bench(f, big, label="4096-iter fori, 1-add body (512,128)")

    # grid pipelining: 64 grid steps, each (512,128) roll+xor
    def k_grid(x_ref, o_ref):
        acc = x_ref[:]
        for j in range(8):
            acc = pltpu.roll(acc, 1 << j, 1) ^ acc
        o_ref[:] = acc

    xg = jnp.arange(64 * 512 * 128, dtype=jnp.uint32).reshape(64 * 512, 128)
    f = jax.jit(pl.pallas_call(
        k_grid,
        grid=(64,),
        out_shape=jax.ShapeDtypeStruct((64 * 512, 128), jnp.uint32),
        in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    ))
    bench(f, xg, label="64-step grid, 8 rolls each (512,128)")


if __name__ == "__main__":
    main()
