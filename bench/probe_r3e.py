"""Round-3 primitive probes, tunnel-robust edition.

Measurement rules learned the hard way (PERF.md section 1 additions):
  * block_until_ready can return before device execution completes on the
    axon tunnel platform: every timing forces a host transfer of a scalar
    checksum derived from the result.
  * The tunnel round trip is ~23 ms (plus ~25 ms for a result transfer):
    kernels must be sized so device time dominates, and rates come from
    differencing two ITERS sizes.
  * Identical dispatches coalesce: every call is salted.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

R = 256


def mk(kind, ITERS, T=128):
    C = T // 128

    def kernel(s_ref, tab_ref, idx_ref, out_ref):
        tabs = [jnp.broadcast_to(tab_ref[c:c + 1, :], (R, 128))
                for c in range(C)]
        start = idx_ref[:] ^ s_ref[0]

        def body_g(i, acc):
            lo = acc & 127
            if C > 1:
                hi = (acc >> 7) & (C - 1)
                out = jnp.zeros_like(acc)
                for c in range(C):
                    g = jnp.take_along_axis(tabs[c], lo, axis=1)
                    out = jnp.where(hi == c, g, out)
            else:
                out = jnp.take_along_axis(tabs[0], lo, axis=1)
            return out

        def body_e(i, w):
            return (w * 5 + 1) ^ (w >> 3)

        r = jax.lax.fori_loop(0, ITERS, body_g if kind == "g" else body_e,
                              start % T if kind == "g" else start)
        out_ref[0, 0] = jnp.sum(r)

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    ))
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, T, (C, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, T, (R, 128)).astype(np.int32))

    def call(s):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.full((1,), s, jnp.int32), tab, idx))
        return time.perf_counter() - t0

    tc = call(0)
    t = min(call(s) for s in (1, 2))
    print(f"  {kind} T={T} ITERS={ITERS}: compile+1st={tc:.2f}s "
          f"best={t*1e3:.1f}ms", flush=True)
    return t


def marginal(kind, itA, itB, T=128):
    tA = mk(kind, itA, T)
    tB = mk(kind, itB, T)
    per_iter = (tB - tA) / (itB - itA)
    n = R * 128
    rate = n / per_iter / 1e9 if per_iter > 0 else float("inf")
    print(f"{kind} T={T}: {per_iter*1e9:.2f} ns/iter -> {rate:.1f} G elem/s",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    marginal("e", 1 << 14, 1 << 17)
    marginal("g", 1 << 12, 1 << 15)
    marginal("g", 1 << 11, 1 << 14, T=512)
    marginal("g", 1 << 10, 1 << 13, T=4096)
