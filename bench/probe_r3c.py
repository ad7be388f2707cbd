"""Probe lane-axis dynamic gather scaling: table width T, tile height R,
dtype, and whether rows can share one table (broadcast row)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def timeit(fn, *args, repeat=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def probe(T, R=64, ITERS=64, tab_rows=None, dtype=jnp.int32):
    """out[i, l] = tab[i % tab_rows, idx[i, l]] chained ITERS times."""
    tab_rows = tab_rows or R

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        if tab_rows != R:
            tab = jnp.broadcast_to(tab, (R, T))
        def body(i, acc):
            g = jnp.take_along_axis(tab, acc & (T - 1), axis=1)
            return (g + 1).astype(jnp.int32)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, 97, (tab_rows, T)), dtype)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, tab, idx)
    n = R * 128 * ITERS
    print(f"lane gather T={T} R={R} tab_rows={tab_rows} {dtype.__name__}: "
          f"{t*1e3:.3f} ms  {n/t/1e9:.3f} G lookups/s")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for T in (128, 256, 512, 1024, 2048, 4096):
        try:
            probe(T)
        except Exception as e:
            print(f"T={T} FAILED:", type(e).__name__, str(e)[:160])
    for R in (8, 256, 512):
        try:
            probe(1024, R=R)
        except Exception as e:
            print(f"R={R} FAILED:", type(e).__name__, str(e)[:160])
    try:
        probe(1024, tab_rows=1)
    except Exception as e:
        print("tab_rows=1 FAILED:", type(e).__name__, str(e)[:160])
    try:
        probe(1024, dtype=jnp.uint16)
    except Exception as e:
        print("u16 FAILED:", type(e).__name__, str(e)[:160])
