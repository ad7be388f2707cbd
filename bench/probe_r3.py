"""Round-3 TPU probes for the Pallas decode/encode kernel redesign.

Questions this answers on the real chip (results -> PERF.md):
  1. Does Mosaic lower per-lane dynamic table lookups (jnp.take /
     take_along_axis) inside a Pallas kernel, and at what rate?
  2. What does the interval-rank resolve core cost (compares + one-hot
     f32 matmul select) per position, all VMEM-resident?
  3. Baseline: elementwise u32 op rate inside a kernel at the same shapes.

Timing discipline per PERF.md section 1: self-chained fori_loop iterations
inside one jitted dispatch; inputs salted per repetition.
"""

import functools
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
    r = jax.block_until_ready(fn(*args))
    best = float("inf")
    for i in range(repeat):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


# ---------------------------------------------------------------------------
# Probe 1: per-lane dynamic lookup in-kernel.
# ---------------------------------------------------------------------------

def probe_take(T=512, R=64, ITERS=64):
    """out = table[idx % T] per element, chained ITERS times."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]          # (1, T) i32
        idx = idx_ref[:]          # (R, 128) i32
        def body(i, acc):
            g = jnp.take(tab[0], acc & (T - 1), axis=0)
            return g + 1
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx)

    tab = jnp.arange(T, dtype=jnp.int32).reshape(1, T) * 7
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, _ = timeit(jax.jit(f), tab, idx)
    n = R * 128 * ITERS
    print(f"take(T={T}) in-kernel: {t*1e3:.3f} ms  {n/t/1e9:.3f} G lookups/s")


# ---------------------------------------------------------------------------
# Probe 2: interval-rank resolve core (the planned decode resolve).
# ---------------------------------------------------------------------------

def probe_rank(TP=8192, ITERS=32, NB=16, NF=32):
    """Per position: 16 coarse compares -> rank_c; one-hot(rank_c) f32
    matmul against (16, NF + NF) fine-boundary+attr table; 32 fine compares
    + telescoped attr select.  Chained; all VMEM."""
    R = TP // 128

    def kernel(fine_ref, attr_ref, w_ref, out_ref):
        fine = fine_ref[:]      # (NB, NF) f32 sorted boundaries
        attr = attr_ref[:]      # (NB, NF) f32 attrs < 2^15
        coarse = fine[:, 0]     # (NB,) coarse ladder

        def body(i, w):
            wf = w.astype(jnp.float32)          # (R, 128) values < 2^24
            rank_c = jnp.zeros_like(w)
            for k in range(1, NB):
                rank_c += (wf >= coarse[k]).astype(jnp.int32)
            # one-hot(rank_c) @ [fine | attr]: (TP, NB) x (NB, 2NF)
            oh = (rank_c.reshape(TP, 1) ==
                  jax.lax.broadcasted_iota(jnp.int32, (TP, NB), 1)
                  ).astype(jnp.float32)
            sel = jnp.dot(oh, jnp.concatenate([fine, attr], axis=1),
                          preferred_element_type=jnp.float32)  # (TP, 2NF)
            F = sel[:, :NF]
            A = sel[:, NF:]
            wcol = wf.reshape(TP, 1)
            c = (wcol >= F).astype(jnp.float32)          # (TP, NF)
            D = A - jnp.pad(A[:, :-1], ((0, 0), (1, 0)))
            attr_v = jnp.sum(c * D, axis=1).astype(jnp.int32)  # (TP,)
            return (w + attr_v.reshape(R, 128)) & 0x3FFFFF
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, w_ref[:])

    bnd = np.sort(np.random.randint(0, 1 << 22, NB * NF)).astype(np.float32)
    fine = jnp.asarray(bnd.reshape(NB, NF))
    attr = jnp.asarray(np.random.randint(0, 1 << 14, (NB, NF)), jnp.float32)
    w = jnp.asarray(np.random.randint(0, 1 << 22, (R, 128)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, _ = timeit(jax.jit(f), fine, attr, w)
    n = TP * ITERS
    print(f"rank-resolve core (TP={TP}): {t*1e3:.3f} ms  "
          f"{n/t/1e9:.3f} G pos/s")


# ---------------------------------------------------------------------------
# Probe 3: elementwise baseline at the same shape.
# ---------------------------------------------------------------------------

def probe_elem(TP=8192, ITERS=512):
    R = TP // 128

    def kernel(w_ref, out_ref):
        def body(i, w):
            return (w * 5 + 1) ^ (w >> 3)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, w_ref[:])

    w = jnp.asarray(np.random.randint(0, 1 << 22, (R, 128)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, _ = timeit(jax.jit(f), w)
    n = TP * ITERS * 3
    print(f"elementwise (TP={TP}): {t*1e3:.3f} ms  {n/t/1e9:.3f} G op/s")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    try:
        probe_take()
    except Exception as e:
        print("take in-kernel FAILED:", type(e).__name__, str(e)[:300])
    try:
        probe_rank()
    except Exception as e:
        print("rank core FAILED:", type(e).__name__, str(e)[:300])
    try:
        probe_elem()
    except Exception as e:
        print("elementwise FAILED:", type(e).__name__, str(e)[:300])
