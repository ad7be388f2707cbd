"""Probe: Mosaic 2-D (sublane) dynamic gather inside a Pallas kernel.

Pattern: table (T, 128) in VMEM (each lane column holds its own copy),
idx (R, 128) per-lane row indices, out[i, l] = table[idx[i, l], l]
via jnp.take_along_axis(tab, idx, axis=0).  If this lowers and runs fast,
the decode resolve becomes ONE direct LUT lookup per position and the
interval-rank machinery is unnecessary.
"""

import os
import sys
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


def probe_sublane_gather(T, R=64, ITERS=64, dtype=jnp.int32, bcast=False):
    def kernel(tab_ref, idx_ref, out_ref):
        if bcast:
            tab = jnp.broadcast_to(tab_ref[:], (T, 128))  # (T,1) -> (T,128)
        else:
            tab = tab_ref[:]
        def body(i, acc):
            g = jnp.take_along_axis(tab, acc & (T - 1), axis=0)
            return g + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])

    tabshape = (T, 1) if bcast else (T, 128)
    tab = jnp.asarray(
        np.broadcast_to(np.arange(T, dtype=np.int32).reshape(T, 1) * 7,
                        tabshape), dtype)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, tab, idx)
    n = R * 128 * ITERS
    print(f"sublane gather T={T} R={R} bcast={bcast}: {t*1e3:.3f} ms  "
          f"{n/t/1e9:.3f} G lookups/s")


def probe_lane_gather(T=128, R=64, ITERS=64):
    """Gather along lanes: out[i, l] = tab[i, idx[i, l]]."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (R, T)
        def body(i, acc):
            g = jnp.take_along_axis(tab, acc & (T - 1), axis=1)
            return g + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, 99, (R, T)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, tab, idx)
    n = R * 128 * ITERS
    print(f"lane gather T={T}: {t*1e3:.3f} ms  {n/t/1e9:.3f} G lookups/s")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for T in (512, 4096):
        try:
            probe_sublane_gather(T)
        except Exception as e:
            print(f"sublane gather T={T} FAILED:", type(e).__name__, str(e)[:200])
    try:
        probe_sublane_gather(4096, bcast=True)
    except Exception as e:
        print("sublane gather bcast FAILED:", type(e).__name__, str(e)[:200])
    try:
        probe_lane_gather()
    except Exception as e:
        print("lane gather FAILED:", type(e).__name__, str(e)[:200])
    # bigger R to amortize loop overhead
    try:
        probe_sublane_gather(4096, R=256, ITERS=64)
    except Exception as e:
        print("sublane gather R=256 FAILED:", type(e).__name__, str(e)[:200])
