"""Probe T=128 lane-permute variants: shared vs per-row tables, dtypes,
tile heights, and a composed 256/512-entry lookup via chunk select."""

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


def probe(name, R, ITERS, make_kernel, tab, idx):
    f = jax.jit(pl.pallas_call(
        make_kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, tab, idx)
    n = R * 128 * ITERS
    print(f"{name}: {t*1e3:.3f} ms  {n/t/1e9:.3f} G lookups/s")


def shared_tab(R=64, ITERS=64, tab_rows=1):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (R, 128))
        def body(i, acc):
            return jnp.take_along_axis(tab, acc & 127, axis=1) + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])
    tab = jnp.asarray(np.random.randint(0, 97, (tab_rows, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    probe(f"shared tab rows={tab_rows} R={R}", R, ITERS, kernel, tab, idx)


def perrow(R=64, ITERS=64, dtype=jnp.int32, R2=None):
    R2 = R2 or R
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        if tab.dtype != jnp.int32:
            tab = tab.astype(jnp.int32)
        def body(i, acc):
            return jnp.take_along_axis(tab, acc & 127, axis=1) + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])
    tab = jnp.asarray(np.random.randint(0, 97, (R, 128)), dtype)
    idx = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    probe(f"per-row tab R={R} {dtype.__name__}", R, ITERS, kernel, tab, idx)


def composed(T=512, R=64, ITERS=64):
    """T-entry lookup from T/128 permutes + selects (idx hi bits pick chunk)."""
    C = T // 128
    def kernel(tab_ref, idx_ref, out_ref):
        tabs = [jnp.broadcast_to(tab_ref[c:c + 1, :], (R, 128))
                for c in range(C)]
        def body(i, acc):
            lo = acc & 127
            hi = (acc >> 7) & (C - 1)
            out = jnp.zeros_like(acc)
            for c in range(C):
                g = jnp.take_along_axis(tabs[c], lo, axis=1)
                out = jnp.where(hi == c, g, out)
            return out + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])
    tab = jnp.asarray(np.random.randint(0, 97, (C, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    probe(f"composed T={T}", R, ITERS, kernel, tab, idx)


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for fn, kw in [
        (shared_tab, {}),
        (shared_tab, {"tab_rows": 8}),
        (perrow, {}),
        (perrow, {"R": 8}),
        (perrow, {"R": 256}),
        (perrow, {"dtype": jnp.uint16}),
        (perrow, {"dtype": jnp.uint8}),
        (composed, {"T": 256}),
        (composed, {"T": 512}),
        (composed, {"T": 1024}),
    ]:
        try:
            fn(**kw)
        except Exception as e:
            print(f"{fn.__name__} {kw} FAILED:", type(e).__name__, str(e)[:160])
